# sug_tpu build/test targets (reference Makefile builds a CUDA docker; here
# the native piece is the C++ data runtime and everything else is JAX).

CXX ?= g++
CXXFLAGS ?= -O3 -shared -fPIC -std=c++17 -pthread

.PHONY: all native test bench clean

all: native

native: sug_tpu/native/libsugloader.so

sug_tpu/native/libsugloader.so: sug_tpu/native/loader.cpp sug_tpu/native/pointops.cpp
	$(CXX) $(CXXFLAGS) $^ -o $@

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -f sug_tpu/native/libsugloader.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
