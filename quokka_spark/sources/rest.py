"""REST API source (reference df.py:655-663, dataset/crypto_dataset.py:4-83).

The parameter list (one dict per request/page) is parallelized into a
DataFrame; each partition issues its own HTTP requests inside
``mapInPandas`` — the Spark-native shape of the reference's
per-channel paginated reader. ``requests`` is imported lazily so the
module loads in environments without it.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import StringType, StructField, StructType

RESULT_SCHEMA = StructType([
    StructField("params", StringType()),
    StructField("response", StringType()),
    StructField("status", StringType()),
])


def _rest_stream(spark: SparkSession, url: str, params_list: list,
                 headers: dict | None, method: str):
    params_df = spark.createDataFrame(
        pd.DataFrame({"params": [json.dumps(p) for p in params_list]}))

    def fetch(it):
        try:
            import requests
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "requests not available in this environment") from e
        session = requests.Session()
        for pdf in it:
            rows = []
            for p in pdf["params"]:
                if method == "GET":
                    resp = session.get(url, params=json.loads(p),
                                       headers=headers or {})
                else:
                    resp = session.post(url, json=json.loads(p),
                                        headers=headers or {})
                rows.append((p, resp.text, str(resp.status_code)))
            yield pd.DataFrame(rows, columns=["params", "response", "status"])

    return params_df.mapInPandas(fetch, schema=RESULT_SCHEMA)


def rest_get_stream(spark: SparkSession, url: str, params_list: list,
                    headers: dict | None = None, batch_size: int = 100):
    return _rest_stream(spark, url, params_list, headers, "GET")


def rest_post_stream(spark: SparkSession, url: str, params_list: list,
                     headers: dict | None = None, batch_size: int = 100):
    """POST variant (reference df.py:655-663 exposes both verbs); the
    per-request dict is sent as the JSON body."""
    return _rest_stream(spark, url, params_list, headers, "POST")
