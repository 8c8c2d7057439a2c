# Developer entry points (reference: /root/reference/Makefile)
.PHONY: all native test bench clean warm-cache

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

# Refresh the shipped pre-warmed XLA compile cache from the local one
# (run after a bench pass on the target hardware; see utils/device.py)
warm-cache:
	mkdir -p .jax_compile_cache
	cp -u $${KMERSEEK_JAX_CACHE:-$$HOME/.cache/kmerseek_jax}/*-cache .jax_compile_cache/ 2>/dev/null || true
