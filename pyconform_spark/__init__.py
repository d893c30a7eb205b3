"""pyconform_spark — a from-scratch PySpark-native time-series rollup,
downsample and retention engine.

Reimagines the reference (Herok4Build/PyConform, a per-variable NetCDF
conversion pipeline, see /root/reference/source/pyconform/dataflow.py:42-98)
as continuous aggregates over a lakehouse ``transcripts`` table:

* per-(conv_id, tool, role) turn-rate / text-length series are bucketed
  into 1m/1h/1d retention tiers (reference analog: calendar rollups,
  ``modules/commonfunctions.py:35-188``),
* gaps are detected and filled with locf / linear interpolation
  (reference analog: ``mapdates.py:112-216`` + ``idl.py:120-153``),
* values are compressed with Gorilla-XOR and timestamps with
  delta-of-delta, as vectorized Arrow codecs (reference analog:
  zlib deflate, ``flownodes.py:825-838``),
* every tier write carries per-partition lineage rows and commits
  atomically so jobs resume from the last checkpoint epoch (reference
  analog: chunk-dedup set + ``.tmp``→rename, ``flownodes.py:851-861``).

Everything is DataFrame-first: Catalyst handles pushdown/pruning/partial
aggregation; Python appears only inside Arrow-vectorized UDFs.
"""

__version__ = "0.1.0"

from pyconform_spark.session import get_spark  # noqa: F401
