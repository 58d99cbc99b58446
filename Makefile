.PHONY: test test-fast quality bench native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

quality:
	python scripts/quality_report.py

bench:
	python bench.py

native:
	g++ -O3 -march=native -std=c++17 -shared -fPIC \
	    rustsasa_tpu/native/fastparse.cpp \
	    -o rustsasa_tpu/native/libfastparse.so -lz

clean:
	rm -rf rustsasa_tpu/native/libfastparse.so .jax_cache \
	    $(shell find . -name __pycache__ -type d)
