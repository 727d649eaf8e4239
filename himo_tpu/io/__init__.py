from himo_tpu.io.submission import (  # noqa: F401
    read_comp_dis_zip,
    write_comp_dis_feather,
    zip_results,
    list_sweep_uuids,
)
