# Developer entry points for dinov2-tpu.
.PHONY: native test bench suite clean clean-check

# Run the full suite from a pristine worktree of HEAD: proves the committed
# tree is self-sufficient (no untracked fixtures / local state). Fails if any
# test needs a file that was never committed.
clean-check:
	@set -e; WT=$$(mktemp -d /tmp/dinov2-cleancheck.XXXXXX); \
	git worktree add --detach $$WT HEAD >/dev/null; \
	trap 'git worktree remove --force $$WT' EXIT; \
	cd $$WT && DINOV2_TPU_NO_FIXTURE_SELFHEAL=1 python -m pytest tests/ -q

native:
	$(MAKE) -C csrc libdinogguf.so

test:
	python -m pytest tests/ -q

bench:
	python bench.py

suite:
	python scripts/tpu_suite.py

clean:
	$(MAKE) -C csrc clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
