# himo_tpu runtime image (the reference's conda/docker env story,
# README.md:32). For Cloud TPU VMs the host usually provides libtpu; this
# image covers CPU development and the host-side pipeline.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    build-essential make g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/himo_tpu
COPY pyproject.toml README.md ./
COPY himo_tpu ./himo_tpu
COPY native ./native
COPY bench.py __graft_entry__.py eval.py save_zip.py ./

RUN pip install --no-cache-dir \
    "jax[cpu]" flax optax orbax-checkpoint chex \
    numpy scipy h5py pandas pyarrow tabulate tqdm scikit-learn opencv-python-headless \
    && pip install --no-cache-dir -e . --no-deps \
    && make -C native

# TPU VMs: pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
ENTRYPOINT ["python", "-m", "himo_tpu.cli.eval"]
