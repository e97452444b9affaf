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

# Fast tier (~3 min): skips multi-process / reference-golden-generation /
# end-to-end-CLI tests marked `slow`.
test-fast:
	python -m pytest tests/ -x -q -m "not slow"

# Container image; ACCELERATOR in {TPU, GPU, CPU} (reference Makefile:5,37-99)
ACCELERATOR ?= TPU
build:
	docker build --build-arg ACCELERATOR=$(ACCELERATOR) -t pst:$(shell echo $(ACCELERATOR) | tr A-Z a-z) .

clean:
	rm -f $(NATIVE_LIB)
	find . -name __pycache__ -type d | xargs rm -rf
