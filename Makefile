# Dev workflow (the reference used a justfile; justfile:4-5)

.PHONY: test bench embed-bench install-models verify-checkpoint native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not golden"

bench:
	python bench.py

embed-bench:
	python benchmarks/embed_bench.py

# download sentence-transformers checkpoints into model_data/
install-models:
	python scripts/install_models.py

# one-command real-checkpoint validation: download -> converter/encoder ->
# golden parity (torch-side when available, committed goldens otherwise);
# add ARGS=--full for the 10M recall harness on TPU.  Airgapped machines
# get SKIPs, never FAILs (VERDICT r2 #9).
verify-checkpoint:
	python scripts/verify_checkpoint.py $(ARGS)

# build the native fs walker explicitly (otherwise built on first use)
native:
	g++ -O2 -std=c++17 -shared -fPIC -pthread \
	  perceive_tpu/native/fastwalk.cpp -o perceive_tpu/native/_fastwalk.so

clean:
	rm -f perceive_tpu/native/_fastwalk.so
	find . -name __pycache__ -type d -exec rm -rf {} +
