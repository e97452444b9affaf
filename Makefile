NATIVE_DIR := protein_structure_tokenizer_tpu/native
NATIVE_LIB := $(NATIVE_DIR)/libpst_native.so
CXX ?= g++
CXXFLAGS ?= -O3 -march=native -ffast-math -fPIC -shared -std=c++17 -Wall

.PHONY: all native test clean build

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_DIR)/tmscore.cc $(NATIVE_DIR)/tmalign.cc $(NATIVE_DIR)/featurize.cc $(NATIVE_DIR)/geom.h
	$(CXX) $(CXXFLAGS) $(filter %.cc,$^) -o $@

test:
	python -m pytest tests/ -x -q

# Fast tier (<3 min with the committed goldens + compile cache): skips
# multi-process / end-to-end-CLI tests marked `slow`; two xdist workers
# (whole files per worker so module-scoped golden fixtures load once),
# falling back to serial when pytest-xdist is absent.
XDIST := $(shell python -c "import xdist" 2>/dev/null && echo "-n 2 --dist loadfile")
test-fast:
	python -m pytest tests/ -x -q -m "not slow" $(XDIST)

# Container image; ACCELERATOR in {TPU, GPU, CPU} (reference Makefile:5,37-99)
ACCELERATOR ?= TPU
IMAGE := pst:$(shell echo $(ACCELERATOR) | tr A-Z a-z)
PORT ?= 8888
WORK_DIR ?= $(CURDIR)
DOCKER_RUN_FLAGS ?= --rm --network host
ifeq ($(ACCELERATOR),TPU)
DOCKER_RUN_FLAGS += --privileged
else ifeq ($(ACCELERATOR),GPU)
DOCKER_RUN_FLAGS += --gpus all
endif

build:
	docker build --build-arg ACCELERATOR=$(ACCELERATOR) -t $(IMAGE) .

# Interactive shell in the image with the repo mounted (reference
# Makefile:45-52,64-66,85-88 `dev_container`).
.PHONY: dev_container
dev_container: build
	docker run -it $(DOCKER_RUN_FLAGS) -v $(WORK_DIR):/app $(IMAGE) /bin/bash

# Jupyter in the image (reference Makefile:49-54,69-74,90-95 `notebook`);
# tunnel the port first when the host is a remote VM.
.PHONY: notebook
notebook: build
	docker run -p $(PORT):$(PORT) -it $(DOCKER_RUN_FLAGS) -v $(WORK_DIR):/app \
		$(IMAGE) python -m jupyter lab --port=$(PORT) --no-browser \
		--ip=0.0.0.0 --allow-root

clean:
	rm -f $(NATIVE_LIB)
	find . -name __pycache__ -type d | xargs rm -rf
