import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from yacy_grid_crawler_spark.session import get_spark

    s = get_spark(app="tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from yacy_grid_crawler_spark.fixtures.gen import generate

    return generate(seed=42, n_docs=300, n_hosts=12)


@pytest.fixture(scope="session")
def docs_df(spark, corpus):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField(
                "spans",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("kind", T.StringType()),
                            T.StructField("text", T.StringType()),
                            T.StructField("media_ref", T.StringType()),
                            T.StructField("offset", T.IntegerType()),
                        ]
                    )
                ),
            ),
        ]
    )
    rows = [
        (d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
        for d in corpus.docs
    ]
    return spark.createDataFrame(rows, schema)


@pytest.fixture(scope="session")
def robots_df(spark, corpus):
    rows = [
        (h, r["disallow"], r["delay_ms"]) for h, r in corpus.robots.items()
    ]
    return spark.createDataFrame(
        rows, "host string, disallow_prefixes array<string>, crawl_delay_ms int"
    )
