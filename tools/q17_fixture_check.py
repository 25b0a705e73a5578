#!/usr/bin/env python3
"""Independent re-derivation of the q17 golden fixture.

Recomputes every expected q17 row from the raw sf0.01 tables using
CPython's OWN difflib.SequenceMatcher (the published Ratcliff/Obershelp
implementation the engine's graft.i18n.Fuzzy mirrors) and compares
against fixtures/q17_expected.parquet. Two independent implementations
of the scorer + translate pipeline agreeing row-for-row is what makes
the committed fixture trustworthy as a driver oracle.

Dev tool only — NOT part of the Spark library.

Usage: python3 tools/q17_fixture_check.py [sfdir]
"""
import sys
import difflib
import re

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FIXTURE = "/root/repo/fixtures/q17_expected.parquet"
CUTOFF = 90


def full_process(s: str) -> str:
    # fuzzywuzzy full_process: non-alphanumerics -> space, lower, trim
    out = "".join(c.lower() if c.isalnum() else " " for c in s)
    return re.sub(" +", " ", out).strip()


def qratio(a: str, b: str) -> int:
    pa, pb = full_process(a), full_process(b)
    if not pa or not pb:
        return 0
    return int(round(difflib.SequenceMatcher(None, pa, pb).ratio() * 100))


def clean(s: str) -> str:
    return ("" if s is None else s).replace(" ", " ").strip().lower()


def translate(raw: str, dict_, keys):
    f, en, ar = [], [], []

    def put(v, x):
        if x not in v:
            v.append(x)

    for tok in (t.strip() for t in raw.split(",")):
        if not tok:
            continue
        key = clean(tok)
        if not key or len(tok) < 3:
            continue
        entry = dict_.get(key)
        if entry is None:
            scored = [(k, qratio(key, k)) for k in keys]
            cands = sorted([x for x in scored if x[1] >= CUTOFF],
                           key=lambda x: -x[1])  # stable: key order on ties
            entry = dict_[cands[0][0]] if cands else None
        if entry is not None:
            heb, e, a = entry
            put(f, clean(heb) or tok)
            put(en, clean(e) or tok)
            put(ar, clean(a) or tok)
        else:
            put(f, tok)
            put(en, tok)
            put(ar, tok)
    return ",".join(f), ",".join(en), ",".join(ar)


def main():
    import pandas as pd
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    customer = pd.read_parquet(f"{SF}/customer.parquet")
    dict_ = {}
    for _, r in nation.iterrows():
        name = r["n_name"]
        dict_[clean(name)] = (name, "en_" + name.lower(), "ar_" + name.lower())
    keys = sorted(dict_.keys())
    nat_by_key = nation.set_index("n_nationkey")["n_name"].to_dict()

    expect = {}
    for _, r in customer[customer["c_custkey"] <= 200].iterrows():
        raw = f"{nat_by_key[r['c_nationkey']]}X,miss_{r['c_custkey']}"
        expect[int(r["c_custkey"])] = translate(raw, dict_, keys)

    fixture = pd.read_parquet(FIXTURE)
    assert len(fixture) == len(expect), \
        f"row count: fixture {len(fixture)} vs derived {len(expect)}"
    bad = 0
    for _, r in fixture.iterrows():
        got = (r["f"], r["f_en"], r["f_ar"])
        want = expect[int(r["c_custkey"])]
        if got != want:
            bad += 1
            print(f"MISMATCH c_custkey={r['c_custkey']}: fixture={got} derived={want}")
    if bad:
        sys.exit(f"{bad}/{len(fixture)} rows disagree")
    print(f"OK: all {len(fixture)} fixture rows re-derived identically "
          f"by CPython difflib")


if __name__ == "__main__":
    main()
