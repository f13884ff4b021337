# dpfx developer entry points
.PHONY: test test-tpu smoke bench native clean

test:
	python -m pytest tests/ -q

test-tpu:  ## run the suite on the real chip
	DPFX_TEST_TPU=1 python -m pytest tests/ -q

smoke:     ## CPU-runnable end-to-end smoke (train -> eval -> generate)
	python train.py configs/smoke_ae_synthetic.yaml train.steps=60 name=make_smoke
	python evaluate.py configs/smoke_ae_synthetic.yaml name=make_smoke --limit 16
	python generate.py configs/smoke_ae_synthetic.yaml name=make_smoke --n-clouds 4 --out /tmp/make_smoke.npy

bench:
	python bench.py

native:    ## force-build the C++ loader
	python -c "from dpfx.native import build_native; print(build_native(verbose=True))"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -f dpfx/native/src/libdpfx_loader_*.so
