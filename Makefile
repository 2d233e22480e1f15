# Convenience entry points. The test targets run on the 8-device virtual
# CPU mesh (tests/conftest.py forces JAX_PLATFORMS=cpu); hardware targets
# ride the axon TPU tunnel and need PYTHONPATH to keep the axon
# sitecustomize visible (NOTES.md round-5 item 6).

PY        ?= python
HW_ENV     = PYTHONPATH=/root/repo:/root/.axon_site

.PHONY: test test-full bench tpucheck capi

# Default surface: the 11 heaviest interpret-mode tests are deselected
# via the `slow` marker (pyproject.toml addopts).
test:
	$(PY) -m pytest tests/ -x -q

# Full surface, including slow-marked tests. Run uncontended at round
# close and record wall time + counts in NOTES.md.
test-full:
	tools/test_full.sh

bench:
	$(HW_ENV) $(PY) bench.py

tpucheck:
	$(HW_ENV) $(PY) tools/tpu_check.py --assert --out TPUCHECK_local.json

capi:
	tools/build_capi.sh
