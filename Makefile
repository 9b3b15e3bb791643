# Top-level targets. Dataset evals auto-detect assets under SLAM_DATA_DIR
# (default /data) and compare against the BASELINE.md bounds table.

SLAM_DATA_DIR ?= /data
PY ?= python

.PHONY: test bench native eval-dry eval-tum eval-kitti eval-euroc eval-all

# native builds first so the native-IO tests run instead of skipping
test: native
	$(PY) -m pytest tests/ -x -q

native:
	$(MAKE) -C native

bench:
	$(PY) bench.py

eval-dry:
	$(PY) examples/eval_datasets.py --dry-run

eval-tum:
	$(PY) examples/eval_datasets.py --data-root $(SLAM_DATA_DIR) --family tum

eval-kitti:
	$(PY) examples/eval_datasets.py --data-root $(SLAM_DATA_DIR) --family kitti

eval-euroc:
	$(PY) examples/eval_datasets.py --data-root $(SLAM_DATA_DIR) --family euroc

eval-all:
	$(PY) examples/eval_datasets.py --data-root $(SLAM_DATA_DIR)
