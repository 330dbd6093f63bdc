#!/bin/bash
# Run the test suite on a virtual 8-device CPU platform WITHOUT claiming the
# single tunneled TPU chip (the axon sitecustomize claims it at interpreter
# start for every python process unless PALLAS_AXON_POOL_IPS is unset; a
# concurrent TPU bench/verify run would otherwise fail to register).
#
# Default run excludes tests marked `slow` (pyproject addopts); pass
# `-m ''` to run the complete suite:  ./run_tests.sh tests/ -m ''
exec env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest "${@:-tests/}" -q
