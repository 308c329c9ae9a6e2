"""detect_renames(parity=True) reproduces the reference predicate
(reference scrape_tickers.py:608-614):

    old_name in new_name or new_name in old_name or
    (len(old_name) > 10 and len(new_name) > 10 and
     any(word in new_name for word in old_name.split() if len(word) > 3))

The fixture names include a pair matched ONLY by the token-substring
clause (token absent as a whole token of the new name) — the case the
default tightened mode deliberately rejects.
"""

from __future__ import annotations

from psx_data_pipeline_spark.operators.diff import detect_renames


def _ref_predicate(old_name: str, new_name: str) -> bool:
    old_name, new_name = old_name.lower(), new_name.lower()
    return (
        old_name in new_name
        or new_name in old_name
        or (
            len(old_name) > 10
            and len(new_name) > 10
            and any(
                w in new_name for w in old_name.split() if len(w) > 3
            )
        )
    )


DELETED = [
    # containment: old name inside new name
    (1, "Habib Bank"),
    # token-substring ONLY: "chemicals" occurs inside
    # "agrichemicalsgroup" but not as a whole token → parity matches,
    # tightened mode must not
    (2, "Sitara Chemicals Industries"),
    # whole-token share: "cement" is a token on both sides
    (3, "Maple Leaf Cement Factory"),
    # no relation to anything added
    (4, "Pakistan Tobacco"),
]
ADDED = [
    (11, "Habib Bank Limited"),
    (12, "AgriChemicalsGroup Holdings"),
    (13, "Kohat Cement Company"),
    (14, "Engro Fertilizers"),
]


def _pairs(df):
    return {(r["old_key"], r["new_key"]) for r in df.collect()}


def test_parity_matches_reference_predicate(spark):
    deleted = spark.createDataFrame(DELETED, ["symbol", "name"])
    added = spark.createDataFrame(ADDED, ["symbol", "name"])

    # pure-Python reference predicate over all pairs; the fixture is
    # built so matches are unambiguous (≤1 per old and per new), so
    # the reference's greedy pick and our deterministic 1:1
    # assignment select identical pairs
    expected = {
        (ok, nk)
        for ok, on in DELETED
        for nk, nn in ADDED
        if _ref_predicate(on, nn)
    }
    assert expected == {(1, 11), (2, 12), (3, 13)}  # fixture sanity

    got = _pairs(detect_renames(deleted, added, parity=True))
    assert got == expected


def test_default_mode_tightens_token_clause(spark):
    deleted = spark.createDataFrame(DELETED, ["symbol", "name"])
    added = spark.createDataFrame(ADDED, ["symbol", "name"])
    got = _pairs(detect_renames(deleted, added, parity=False))
    # the token-substring-only pair (2, 12) requires parity mode
    assert (2, 12) not in got
    assert {(1, 11), (3, 13)} <= got
