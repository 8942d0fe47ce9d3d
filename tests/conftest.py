from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from mapreduce_minhash_lsh_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark
    spark.stop()


# The reference's 5-line demo corpus (src/main/resources/documents.txt),
# ids = line numbers (the reference uses byte offsets 0,17,39,57,111 —
# an MR artifact; identity is what matters for parity).
GOLDEN_DOCS = [
    (0, "I ate an apple."),
    (1, "I went to the Apple."),
    (2, "I ate an orange."),
    (3, "This has nothing in common with the other sentences."),
    (4, "This sentence has a lot in common with the previous sentence."),
]

# Undirected golden pair set from results/pairs/part-r-00000.
GOLDEN_PAIRS = {(0, 2), (3, 4)}


@pytest.fixture()
def golden_docs(spark):
    return spark.createDataFrame(GOLDEN_DOCS, ["doc_id", "text"])
