"""flexgraph_spark — a from-scratch PySpark-native link-graph analytics engine.

Re-expresses the capabilities of snudatalab/FlexGraph (Hadoop GIM-V:
generalized iterative sparse matrix-vector multiplication; see
/root/reference/src/main/java/flexgraph/computation/ComputationMapper.java)
as idiomatic Spark DataFrame plans:

* ``graph``      — edge derivation from a source-code repo table, id assignment
* ``gimv``       — the generic superstep runner (flat join/agg plan)
* ``blocks``     — FlexGraph-style block prepartitioning + dense/sparse skew path
* ``algorithms`` — PageRank, connected components, SSSP, label propagation,
                   triangle counting, degrees
* ``checkpoint`` — per-iteration lineage/metrics manifest + resume
* ``textops``    — training-data pipeline ops (dedup, quality, similarity)
* ``fixtures``   — deterministic synthetic inputs (FIXTURES.md)
* ``oracle``     — pure-NumPy reference oracles for tests
"""

__version__ = "0.1.0"
