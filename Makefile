# Convenience targets. CPU runs force-skip the axon TPU plugin (fast startup).
PY_CPU = env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python

.PHONY: test bench native clean solve-%

test:
	env PALLAS_AXON_POOL_IPS= python -m pytest tests/ -q

bench:
	python bench.py

native:
	g++ -O2 -shared -fPIC -std=c++17 -o mioc_tpu/native/libmioc_triangle.so mioc_tpu/native/triangle.cpp
	g++ -O3 -march=native -std=c++17 -o mioc_tpu/native/bellman_baseline mioc_tpu/native/bellman_baseline.cpp

solve-%:
	$(PY_CPU) -m mioc_tpu.cli $* --no-plot

clean:
	rm -rf mioc_tpu/native/*.so mioc_tpu/native/bellman_baseline data_files results.png final-state.*
