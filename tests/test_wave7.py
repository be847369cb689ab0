"""Wave-7 catalog entries vs DuckDB oracle (sf0.001)."""

from __future__ import annotations

import duckdb
import pytest

from opengauss_tools_datachecker_performance_spark.entry_queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", ["ann_ivf"])
def test_wave7_matches_oracle(spark, duck, name):
    got = {tuple(map(str, r)) for r in QUERIES[name](spark, SF_DIR).collect()}
    want = {tuple(map(str, r)) for r in duck.execute(ORACLES[name]).fetchall()}
    assert got == want and len(got) > 0


def test_lang_id_profile_argmax_and_unknown(spark):
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        lang_id_profile,
    )

    docs = spark.createDataFrame(
        [
            (1, "der hund und die katze das ist nicht mit"),   # de
            (2, "le chat et la maison les des est une dans"),  # fr
            (3, "el perro los gatos las de que es una por"),   # es
            (4, "the cat and the dog of it was for to in"),    # en
            (5, "zzz qqq www"),                                # no markers
            (6, "the"),                                        # 1 hit < min_hits
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.lang, r.n_hits) for r in lang_id_profile(docs, "doc_id", "text").collect()}
    assert got["1"][0] == "de" and got["2"][0] == "fr"
    assert got["3"][0] == "es" and got["4"][0] == "en"
    assert got["5"] == ("unknown", 0)
    assert got["6"] == ("unknown", 0)


def test_lang_id_profile_tie_break_is_marker_order(spark):
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        lang_id_profile,
    )

    # "que" is a marker for BOTH fr and es → 2-2 tie → fr wins
    # (earlier in LANG_MARKERS)
    docs = spark.createDataFrame([(1, "que que")], "doc_id long, text string")
    [r] = lang_id_profile(docs, "doc_id", "text").collect()
    assert (r.lang, r.n_hits) == ("fr", 2)
