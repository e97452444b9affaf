# Container image for protein_structure_tokenizer_tpu.
#
# Counterpart of the reference's build-source/dev.Dockerfile (micromamba +
# per-accelerator jax extra), TPU-first: python slim base, one pip install
# with the accelerator chosen by build arg, native C++ fast paths compiled
# in the image.
#
#   docker build --build-arg ACCELERATOR=TPU -t pst:tpu .
#   docker build --build-arg ACCELERATOR=CPU -t pst:cpu .
#   docker build --build-arg ACCELERATOR=GPU -t pst:gpu .
#
#   docker run pst:tpu pst tokenize --pdb_dir /data --token_save_path /out \
#       --codebook_size 4096 --weights /weights/4k_df_1
FROM python:3.12-slim

ENV LANG=C.UTF-8 LC_ALL=C.UTF-8 PYTHONDONTWRITEBYTECODE=1 PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1 PIP_DISABLE_PIP_VERSION_CHECK=1

RUN apt-get update && \
    apt-get install -y --no-install-recommends g++ make && \
    rm -rf /var/lib/apt/lists/*

# ACCELERATOR in {TPU, GPU, CPU}: selects the jax wheel flavor.
ARG ACCELERATOR=TPU
RUN case "$ACCELERATOR" in \
      TPU) pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html ;; \
      GPU) pip install "jax[cuda12]" ;; \
      CPU) pip install jax ;; \
      *) echo "unknown ACCELERATOR=$ACCELERATOR" && exit 1 ;; \
    esac

WORKDIR /app
COPY pyproject.toml README.md Makefile ./
COPY protein_structure_tokenizer_tpu ./protein_structure_tokenizer_tpu

RUN make native && pip install .

ENTRYPOINT []
CMD ["pst", "--help"]
