# Developer entry points for dinov2-tpu.
.PHONY: native test bench suite clean

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
