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

# Rebuild the shipped pre-warmed XLA compile cache from the local one
# (run after a bench pass on the target hardware). Rebuilds from
# scratch: stale-keyed and trivial entries are pruned, provenance
# recorded — see ci/warm_cache.py and utils/device.py.
warm-cache:
	python ci/warm_cache.py
