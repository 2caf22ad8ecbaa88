# supersampler-tpu build / test / bench entry points.

NATIVE_SRC := csrc/spsp_native.c csrc/spsp_finish.c csrc/spsp_io.c
NATIVE_LIB := build/libspsp_native.so
CC ?= cc

.PHONY: all native test bench clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_SRC)
	mkdir -p build
	$(CC) -O3 -march=native -shared -fPIC -o $@ $(NATIVE_SRC) -lm

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

clean:
	rm -rf build/*.so
