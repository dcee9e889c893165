"""quokka_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of marsupialtail/quokka (reference studied
at /root/reference; architecture is Spark-first, not a port).

Public surface mirrors pyquokka:

    from quokka_spark import QuokkaContext, LocalCluster
    qc = QuokkaContext(LocalCluster())
    lineitem = qc.read_parquet(".../lineitem.parquet")
    lineitem.filter_sql("l_shipdate <= date '1998-09-02'") \
            .groupby(["l_returnflag"]).agg_sql("sum(l_quantity) as s") \
            .collect()
"""

from .context import LocalCluster, QuokkaContext
from .datastream import DataStream, GroupedDataStream
from .executor import Executor
from .expression import Expression
from .orderedstream import OrderedStream
from .windowtypes import (HoppingWindow, OnCompletionTrigger, OnEventTrigger,
                          SessionWindow, SlidingWindow, TumblingWindow)

__all__ = [
    "QuokkaContext", "LocalCluster", "DataStream", "GroupedDataStream",
    "OrderedStream", "Expression", "Executor", "HoppingWindow",
    "TumblingWindow", "SlidingWindow", "SessionWindow",
    "OnCompletionTrigger", "OnEventTrigger",
]

__version__ = "0.1.0"
