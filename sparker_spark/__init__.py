"""sparker_spark — a PySpark-native entity-resolution + data-pipeline engine.

A from-scratch, DataFrame-first re-expression of the capabilities of the
reference SparkER library (Gaglia88/sparker, read-only mirror at
/root/reference). Every operator is declared with the Spark DataFrame/SQL
API so Catalyst/Tungsten/AQE pick the physical plan; there are no
driver-resident block indexes and no per-partition Python loops in the
hot path (reference: python/sparker/wnp.py:98-103 allocates O(max_id)
arrays per partition — this engine replaces that with joins+aggregates).

Public surface mirrors the reference package export list
(python/sparker/__init__.py:1-18) so its example notebooks port
nearly line-for-line.
"""

from sparker_spark.session import get_spark
from sparker_spark.wrappers import CSVWrapper, JSONWrapper, PandasWrapper, DataFrameWrapper
from sparker_spark.blocking.strategies import BlockingKeysStrategies
from sparker_spark.blocking.blockers import Blocking, BlockCollection
from sparker_spark.blocking.converters import Converters
from sparker_spark.filters import BlockPurging, BlockFiltering
from sparker_spark.metablocking.pruning_utils import (
    WeightTypes,
    ThresholdTypes,
    ComparisonTypes,
)
from sparker_spark.metablocking.weights import EdgeWeighting
from sparker_spark.metablocking.wnp import WNP
from sparker_spark.metablocking.wep import WEP
from sparker_spark.metablocking.cep import CEP
from sparker_spark.metablocking.cnp import CNP
from sparker_spark.evaluation import Evaluation, StatisticsEstimator
from sparker_spark.attribute_clustering import AttributeClustering
from sparker_spark.progressive import PPS, GSPSN
from sparker_spark.feature_generator import FeatureGenerator
from sparker_spark.supervised import SupervisedMB
from sparker_spark.asof import AsofJoin
from sparker_spark.rangejoin import RangeJoin
from sparker_spark.rollup import RollupCascade
from sparker_spark.sketches import CountMinSketch
from sparker_spark.graph import ConnectedComponents
from sparker_spark.llm.dedup import Dedup
from sparker_spark.llm.similarity import IVFIndex, SimilaritySearch
from sparker_spark.llm.search import TextSearch
from sparker_spark.llm.text import TextAnalysis
from sparker_spark.llm.curation import Decontamination, RepetitionStats
from sparker_spark.llm.sampling import Sampling
from sparker_spark.llm.setjoin import SetSimilarityJoin
from sparker_spark.llm.curation import QualityFilter, Redaction
from sparker_spark.funnel import Anomaly, Decay, Funnel, Retention
from sparker_spark.sketches import BloomFilter, HyperLogLog
from sparker_spark.dedupe import dedupe
from sparker_spark.curate import curate

__all__ = [
    # reference export list (python/sparker/__init__.py:1-18)
    "get_spark",
    "CSVWrapper",
    "JSONWrapper",
    "PandasWrapper",
    "DataFrameWrapper",
    "BlockingKeysStrategies",
    "Blocking",
    "BlockCollection",
    "Converters",
    "BlockPurging",
    "BlockFiltering",
    "WeightTypes",
    "ThresholdTypes",
    "ComparisonTypes",
    "EdgeWeighting",
    "WNP",
    "WEP",
    "CEP",
    "CNP",
    "Evaluation",
    "StatisticsEstimator",
    "AttributeClustering",
    "PPS",
    "GSPSN",
    "FeatureGenerator",
    "SupervisedMB",
    # engine extensions (training-data pipeline surface)
    "AsofJoin",
    "RangeJoin",
    "CountMinSketch",
    "RollupCascade",
    "ConnectedComponents",
    "Dedup",
    "SimilaritySearch",
    "IVFIndex",
    "TextAnalysis",
    "TextSearch",
    "Decontamination",
    "RepetitionStats",
    "Sampling",
    "SetSimilarityJoin",
    "QualityFilter",
    "Redaction",
    "Funnel",
    "Retention",
    "Decay",
    "Anomaly",
    "HyperLogLog",
    "BloomFilter",
    "dedupe",
    "curate",
]
