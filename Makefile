# Convenience targets (see .github/workflows/ci.yml for the CI equivalent)
PY ?= /opt/venv/bin/python

test:
	$(PY) -m pytest tests -q

bench:
	$(PY) bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean

.PHONY: test bench native clean
