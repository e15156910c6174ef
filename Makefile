# Developer entry points (reference: Makefile + PrivateRules.mak drive
# lint/test via SKA templates; here: plain make targets).

.PHONY: test lint bench coverage native

test:
	python -m pytest tests/ -q

coverage:
	python -m pytest tests/ -q --cov=ska_sdp_cip_tpu --cov-report=term

lint:
	python -m flake8 ska_sdp_cip_tpu tests || true

bench:
	python bench.py

native:
	$(MAKE) -C native
