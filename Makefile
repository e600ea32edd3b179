# Test tiers.
#
# `make test`      — CPU tier: full suite on 8 virtual devices (no TPU).
# `make tpu-test`  — compiled-kernel tier on a real TPU host: the same
#                    kernel-vs-oracle contracts with interpret=False
#                    (VMEM budgets, layouts, CompilerParams all real).
#                    Under the axon tunnel, also export
#                    PYTHONPATH=/root/.axon_site:$PYTHONPATH.

test:
	python -m pytest tests/ -q

tpu-test:
	MMRAG_TPU_TESTS=1 python -m pytest tests/test_tpu_kernels.py -v

.PHONY: test tpu-test
