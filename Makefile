# Developer entry points (reference: /root/reference/Makefile)
.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C kmerseek_tpu/native

test: native
	JAX_PLATFORMS=cpu python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C kmerseek_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
