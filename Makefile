# Counterpart of the reference's Makefile (reference Makefile:2-31 wraps
# docker-compose; here targets wrap the local toolchain directly).

PY ?= python

.PHONY: test test-all bench native clean check run

# fast suite (CPU, 8 virtual devices — conftest forces the platform)
test:
	$(PY) -m pytest tests/ -x -q

# full suite incl. end-to-end smoke runs of every implementation
test-all:
	$(PY) -m pytest tests/ -q
	$(PY) -m pytest tests/ -q -m slow

bench:
	$(PY) bench.py

# C++ decode pipeline (libanimeface_io.so)
native:
	$(MAKE) -C native

# quick sanity: dispatcher + one tiny synthetic run (reference `make check`)
check:
	$(PY) main.py GAN --synthetic-data --num-images 64 --image-size 32 \
	    --batch-size 8 --max-iters 2 --save 1 --no-bf16 --latent-dim 16

# usage: make run MODEL=StyleGAN2 ARGS="--image-size 256"
MODEL ?= StyleGAN2
run:
	$(PY) main.py $(MODEL) $(ARGS)

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
