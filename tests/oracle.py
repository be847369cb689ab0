"""Pure-Python reference oracle (no Spark) for the check semantics.

Mirrors the reference's compare contract (SliceCheckWorker /
Maps.difference, see SURVEY.md §2.3 J1) over pandas-collected rows:
canonical span sequence = spans sorted by offset, each rendered
(kind, text→'' if null, media_ref→'' if null); doc equality ⇔
sequence equality. Used by tests to verify the engine's verdicts and
violation rows independently (FIXTURES.md "reference fixtures").
"""

from __future__ import annotations


def canon_spans(spans) -> tuple:
    rows = sorted(spans, key=lambda s: s["offset"])
    return tuple(
        (s["kind"] or "", s["text"] or "", s["media_ref"] or "") for s in rows
    )


def collect_docs(df) -> dict[str, tuple]:
    """doc_id → canonical sequence (last wins for dup ids, like the
    reference's bucket-map overwrite, Bucket.java:84-87)."""
    out = {}
    for r in df.collect():
        out[r["doc_id"]] = canon_spans([s.asDict() for s in r["spans"]])
    return out


def classify(src: dict[str, tuple], sink: dict[str, tuple]) -> dict[str, set[str]]:
    inserts = {k for k in src if k not in sink}
    deletes = {k for k in sink if k not in src}
    updates = {k for k in src if k in sink and src[k] != sink[k]}
    return {"insert": inserts, "delete": deletes, "update": updates}


def first_divergence(a: tuple, b: tuple) -> int:
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return i
    return min(len(a), len(b))
