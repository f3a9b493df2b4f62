.PHONY: test bench scale smoke sweep dist

# build the --py-files artifact for the jobs/ spark-submit entrypoints
dist:
	rm -f marie_icr_spark.zip
	zip -qr marie_icr_spark.zip marie_icr_spark -x '*/__pycache__/*'

# full driver-style oracle sweep at sf0.1 (catches scale-sensitive oracle
# bugs the driver's sf0.01 gate cannot; budget ~20 min)
sweep:
	python sweep_oracles.py --sf-dir /root/testdata/sf0.1

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
