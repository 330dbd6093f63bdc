#!/bin/bash
# Run the test suite on a virtual 8-device CPU platform so sharding tests
# get a multi-device mesh and any attached accelerator stays free for a
# concurrently running benchmark (JAX_PLATFORMS=cpu keeps pytest off it;
# unsetting the pool variable below disables any site-configured
# accelerator auto-attach hook — a no-op where none exists).
#
# Default run excludes tests marked `slow` (pyproject addopts); pass
# `-m ''` to run the complete suite:  ./run_tests.sh tests/ -m ''
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest "${@:-tests/}" -q
