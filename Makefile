.PHONY: test bench scale smoke

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

scale:
	python scaling_bench.py --record

smoke:
	python -c "from pyspark.sql import SparkSession; import __spark_entry__ as E; \
s = SparkSession.builder.master('local[4]').config('spark.ui.enabled','false').getOrCreate(); \
print(E.entry(s).count()); s.stop()"
