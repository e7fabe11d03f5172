# Convenience targets. TPU runs assume exclusive access to the chip.

test:            ## full suite on an 8-device virtual CPU mesh
	python -m pytest tests/ -q

test-fast:       ## critical path in <3 min (skips slow CLI + heavy compile suites)
	python -m pytest tests/ -q -m "not slow and not heavy"

test-heavy:      ## the compile-heavy suites (whole models, TF parity, NAS)
	python -m pytest tests/ -q -m "heavy"

test-notslow:    ## everything except CLI subprocess tests
	python -m pytest tests/ -q -m "not slow"

bench:           ## single-chip train throughput (one JSON line)
	python bench.py

dryrun:          ## multi-chip SPMD dry run on 8 virtual CPU devices
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

.PHONY: test test-fast test-heavy test-notslow bench dryrun smoke

smoke:           ## 15s critical-path health check (CPU)
	SELD_PLATFORM=cpu python scripts/smoke.py
