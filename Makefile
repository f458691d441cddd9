# Developer entry points.

.PHONY: all native test test-fast bench bench-full scaling clean

all: native

# Native C++ candidate enumerator -> differt2d_tpu/rt/libenumerate.so
native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q --ignore=tests/test_examples.py \
	    --ignore=tests/test_multihost.py

bench:
	python bench.py

bench-full:
	BENCH_FULL=1 python bench.py

scaling:
	python tools/bench_scaling.py

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache
