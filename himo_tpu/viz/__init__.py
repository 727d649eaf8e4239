from himo_tpu.viz.render import render_bev, COLOR_MAP, hex_to_rgb  # noqa: F401
