.PHONY: test test-fast bench lint clean docs

test:
	python -m pytest tests/ -x -q

docs:
	python docs/gen_api.py
	@echo "API pages in docs/api/ (sphinx users: sphinx-build -b html docs docs/_build)"

test-fast:
	python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

bench-quick:
	python bench.py --quick

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -rf .pytest_cache
