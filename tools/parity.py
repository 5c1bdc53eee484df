#!/usr/bin/env python3
"""Executable pin of DIVERGENCES.md — reference-vs-engine field parity.

Runs the reference's own `clean_contacts.py` (imported unmodified from
/root/reference through a sandbox symlink, so not a line of it lives in
this repo) and the engine's Clean + GoldenRecord stages on the SAME
uppercase-header fixture (the header case where the reference behaves as
intended — DIVERGENCES.md #1), then classifies every cell-level
difference into a documented divergence class:

  divergence_2   the reference's astype(str) NaN pollution ("nan"/"Nan"
                 artifacts in name/address fields) vs the engine's nulls
  divergence_7   MOBILE: the reference's "contains PHONE" convention
                 skips it; the engine cleans it to digits
  divergence_6   merge ties: both winners are members of the group's
                 candidate set (ordering-dependent pick)
  format_ts      same instant, different timestamp serialization
  format_num     same number, int-vs-float serialization

Anything OUTSIDE these classes fails the lane — and so does a run where
divergence_2 / divergence_7 are never exercised (a vacuous pin).

Usage: python3 tools/parity.py            (PARITY_ROWS=2500 by default)
Driver-side tooling only (pandas); the engine library has no Python.
"""

import importlib.util
import os
import re
import shutil
import subprocess
import sys
import tempfile

import pandas as pd

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ROWS = int(os.environ.get("PARITY_ROWS", "2500"))

NAME_COLS = {"FIRSTNAME", "LASTNAME", "FULLNAME", "TITLE"}
SENTINELS = {"nan", "Nan", "NaN", "None", "<NA>", "NaT"}


def cell(v):
    """Reference-frame cell -> comparable string. Real NA becomes '', but
    the LITERAL 'nan' strings the reference's astype(str) produces are
    values and stay visible (that is divergence #2)."""
    if pd.isna(v):
        return ""
    return str(v)


def digits(s):
    return re.sub(r"\D", "", s or "")


def strip_nan_tokens(s):
    return " ".join(t for t in (s or "").split() if t not in SENTINELS)


def ts_equal(a, b):
    try:
        return pd.to_datetime(a) == pd.to_datetime(b)
    except Exception:
        return False


def num_equal(a, b):
    try:
        return a != "" and b != "" and float(a) == float(b)
    except ValueError:
        return False


def classify(col, ref, eng, ref_members=None, eng_members=None):
    """Divergence class for one cell difference ('equal' when none)."""
    if ref == eng:
        return "equal"
    if ref in SENTINELS and eng == "":
        return "divergence_2"
    if col in NAME_COLS and strip_nan_tokens(ref) == eng:
        return "divergence_2"
    if col == "MOBILE" and digits(ref) == eng:
        return "divergence_7"
    if col == "LAST_UPDATED" and ts_equal(ref, eng):
        return "format_ts"
    if num_equal(ref, eng):
        return "format_num"
    # merge-stage fallbacks: the two engines picked different group
    # members (ordering ties, or cleaning changed the length ranking)
    if ref_members is not None and eng_members is not None:
        if col == "MOBILE" and eng in {digits(m) for m in ref_members}:
            return "divergence_7"
        if col in NAME_COLS and eng in {strip_nan_tokens(m)
                                        for m in ref_members}:
            return "divergence_2"
        if ref in ref_members and eng in eng_members:
            return "divergence_6"
    return "UNDOCUMENTED"


def read_tsv_str(path):
    return pd.read_csv(path, sep="\t", dtype=str, keep_default_na=False)


# ---------------------------------------------------------------- fill lane

# pandas' default na_values: every reference read nulls these BEFORE any
# reference code runs — part of the reference's effective semantics
PANDAS_NA = {"", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN",
             "-nan", "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL",
             "NaN", "None", "n/a", "nan", "null"}
# the engine's Cleaning.MissingSentinels view (exact-after-trim)
ENG_SENTINELS = {"", "nan", "None", "NaN", "N/A", "n/a", "NA", "#N/A",
                 "NULL", "null", "<NA>"}


def ref_view(v):
    """What the reference sees after pd.read_csv(...).fillna('')."""
    return "" if str(v) in PANDAS_NA else str(v)


def eng_missing(v):
    return str(v).strip() in ENG_SENTINELS


def norm_value(v):
    if v == "" or pd.isna(v):
        return ""
    return re.sub(r"\s+", " ", str(v).strip().lower())


def norm_phone_key(v):
    d = digits(str(v))
    return d[-10:] if len(d) >= 10 else d


def row_keys(first, last, full, email, phone, side):
    """One row's (name, email, phone) match keys under `side` semantics.

    ref: get_full_name/normalize over the pandas-NA-nulled view, email =
    X_EMAIL2-or-Email role value, missing == exactly ''.
    eng: Cleaning.fullName — first+last concatenated RAW (no sentinel
    filter), FULLNAME fallback only when that is empty AND the fallback is
    sentinel-present; email lower+trim of the raw value."""
    if side == "ref":
        first, last, full, email, phone = map(ref_view,
                                              (first, last, full, email,
                                               phone))
        f0, l0 = norm_value(first), norm_value(last)
        name = f"{f0} {l0}".strip() if (f0 or l0) else norm_value(full)
        return name, norm_value(email), norm_phone_key(phone)
    fl = re.sub(r"\s+", " ", f"{first} {last}").strip()
    name = fl if fl else (str(full) if not eng_missing(full) else "")
    return (norm_value(name), str(email).strip().lower(),
            norm_phone_key(phone))


def master_keys(fixture, email_col, side):
    return [row_keys(r["FIRSTNAME"], r["LASTNAME"], r["FULLNAME"],
                     r[email_col], r["MOBILE"], side)
            for _, r in fixture.iterrows()]


def cell_missing(v, side):
    return ref_view(v) == "" if side == "ref" else eng_missing(v)


def value_fills(v, side):
    """Can `v` be copied into a missing target under `side` semantics?"""
    if side == "ref":
        v2 = ref_view(v)
        return (v2 != "" and v2 != "nan", v2)
    return (not eng_missing(v), str(v))


def fillable_cells(fixture, keys, fields, side):
    """(row_position, field) -> candidate fill values: a row is fillable
    from SOME source row matching >=2 of (name, email, phone) with a
    fillable value in a mapped source field — the order-independent union
    over sources and candidates, i.e. everything first-match-wins could
    ever have picked under either source ordering."""
    out = {}
    missing = {
        (i, f)
        for i, (_, r) in enumerate(fixture.iterrows())
        for f in fields
        if cell_missing(r[f], side)
    }
    for fname in sorted(os.listdir(os.path.join(REF, "data_files"))):
        if not fname.endswith(".tsv"):
            continue
        src = pd.read_csv(os.path.join(REF, "data_files", fname),
                          sep="\t", dtype=str, keep_default_na=False)
        s_first = next((c for c in src.columns
                        if c in ["First Name", "FirstName", "firstname"]),
                       None)
        s_last = next((c for c in src.columns
                       if c in ["Last Name", "LastName", "lastname"]), None)
        s_name = next((c for c in src.columns
                       if c in ["Name", "Full Name", "FullName",
                                "fullname"]), None)
        s_email = next((c for c in src.columns
                        if c in ["Email Address", "Email", "email"]), None)
        s_phones = [c for c in src.columns
                    if any(p in c for p in ["Phone Number", "Mobile Number",
                                            "Phone", "Mobile", "mobile",
                                            "phone"])]
        if not (s_first and s_last or s_name) or \
                (not s_email and not s_phones):
            continue
        src_field_of = {"FIRSTNAME": s_first, "LASTNAME": s_last,
                        "MOBILE": s_phones[0] if s_phones else None}
        src_rows = list(src.iterrows())
        skeys = [row_keys(r[s_first] if s_first else "",
                          r[s_last] if s_last else "",
                          r[s_name] if s_name else "",
                          r[s_email] if s_email else "",
                          r[s_phones[0]] if s_phones else "", side)
                 for _, r in src_rows]
        by_name, by_email, by_phone = {}, {}, {}
        for j, (n, e, p) in enumerate(skeys):
            if n:
                by_name.setdefault(n, []).append(j)
            if e:
                by_email.setdefault(e, []).append(j)
            if p:
                by_phone.setdefault(p, []).append(j)
        for i, (n, e, p) in enumerate(keys):
            cands = set()
            cands.update(by_name.get(n, []) if n else [])
            cands.update(by_email.get(e, []) if e else [])
            cands.update(by_phone.get(p, []) if p else [])
            for j in cands:
                sn, se, sp = skeys[j]
                score = sum([bool(n) and sn == n, bool(e) and se == e,
                             bool(p) and sp == p])
                if score < 2:
                    continue
                for f, sc in src_field_of.items():
                    if sc is None or (i, f) not in missing:
                        continue
                    ok, v = value_fills(src_rows[j][1][sc], side)
                    if ok:
                        out.setdefault((i, f), set()).add(v)
    return out


def validate_lane(eng_prefix, failures):
    """Reference validate_fields.py vs Validate.referenceReport on the
    SAME input file — the engine's golden TSV. Unlike the other lanes,
    both validators read byte-identical bytes, so the reports must agree
    EXACTLY: same error rows, same composed names, same messages in the
    same rule order (the message-vocabulary parity SURVEY.md claims)."""
    import json
    sbv = tempfile.mkdtemp(prefix="parityval_")
    os.symlink(os.path.join(REF, "cleaning"), os.path.join(sbv, "cleaning"))
    os.makedirs(os.path.join(sbv, "output"))
    shutil.copy(eng_prefix + ".golden.tsv",
                os.path.join(sbv, "output", "cleaned_contacts.tsv"))
    spec = importlib.util.spec_from_file_location(
        "ref_val", os.path.join(sbv, "cleaning", "validate_fields.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # __main__-guarded
    cwd = os.getcwd()
    os.chdir(sbv)
    try:
        mod.main()
    finally:
        os.chdir(cwd)
    ref = {e["row"]: (e["name"], list(e["errors"]))
           for e in json.load(open(os.path.join(
               sbv, "output", "validation_errors.json")))}
    eng = {e["row"]: (e["name"], list(e["errors"]))
           for e in json.load(open(eng_prefix + ".validation.json"))}
    counts = {"equal": 0, "divergence_2": 0, "UNDOCUMENTED": 0}
    bad = []
    for r in sorted(set(ref) | set(eng)):
        rv, ev = ref.get(r), eng.get(r)
        if rv == ev:
            counts["equal"] += 1
        elif (rv is not None and ev is not None and rv[1] == ev[1]
              and [t for t in rv[0].split(" ") if t not in SENTINELS]
                  == [t for t in ev[0].split(" ") if t not in SENTINELS]):
            # the validator's own astype-str pollution: a missing LASTNAME
            # reads back as the string 'nan' and lands IN THE REPORTED
            # NAME ("Marty nan" — the ledger's "Charlie Nan" shape); the
            # error lists themselves are identical
            counts["divergence_2"] += 1
        else:
            counts["UNDOCUMENTED"] += 1
            bad.append((r, rv, ev))
    print(f"[parity] validate lane: reference {len(ref)} error rows, "
          f"engine {len(eng)}; classes: {counts}")
    for d in bad[:10]:
        print("[parity]   VALDIFF:", d)
    if counts["UNDOCUMENTED"] > 0:
        failures.append(f"validate lane: {counts['UNDOCUMENTED']} row "
                        "report(s) differ outside the documented classes")
    if counts["equal"] == 0:
        failures.append("validate lane: no identical error rows — vacuous")


def fill_lane(fixture, failures, variant="natural"):
    """Reference fill_missing_contacts.py vs engine Fill.fillFromSources on
    the same fixture + the reference's real data_files sources. Fill
    results are ordering-dependent (#5 listdir vs sorted sources, #6
    first-match-wins candidate order) and key-surface-dependent (#9
    X_EMAIL2 vs EMAIL; FULLNAME never a reference fill target), so the
    lane compares the common fill surface {FIRSTNAME, LASTNAME, MOBILE}
    against the order-independent FILLABLE closure under each side's own
    key semantics: every fill must be fillable under its side's keys
    (else UNDOCUMENTED), asymmetries and value differences must sit
    inside the candidate sets (#5/#6) or the email-role split (#9)."""
    import json
    cwd = os.getcwd()
    sb = tempfile.mkdtemp(prefix="parityfill_")
    os.symlink(os.path.join(REF, "cleaning"), os.path.join(sb, "cleaning"))
    os.symlink(os.path.join(REF, "data_files"),
               os.path.join(sb, "data_files"))
    os.makedirs(os.path.join(sb, "output"))
    master_path = os.path.join(sb, "output", "MergedDatabase.tsv")
    pristine = os.path.join(sb, "master_orig.tsv")
    fixture.to_csv(master_path, sep="\t", index=False)
    fixture.to_csv(pristine, sep="\t", index=False)  # ref overwrites master

    spec = importlib.util.spec_from_file_location(
        "ref_fill", os.path.join(sb, "cleaning",
                                 "fill_missing_contacts.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # main() is __main__-guarded: no side run
    os.chdir(sb)
    try:
        mod.main()
    finally:
        os.chdir(cwd)
    ref_log = json.load(open(os.path.join(sb, "output",
                                          "fill_missing_log.json")))
    print(f"[parity] fill lane ({variant}): reference made "
          f"{len(ref_log)} fills")

    eng_prefix = os.path.join(sb, "engine")
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.ParityFillDump {pristine} "
         f"{os.path.join(sb, 'data_files')} {eng_prefix}"],
        cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        sys.exit("[parity] engine ParityFillDump failed")
    eng_log = read_tsv_str(eng_prefix + ".filllog.tsv")
    print(f"[parity] fill lane ({variant}): engine made {len(eng_log)} fills")

    common_fields = ["FIRSTNAME", "LASTNAME", "MOBILE"]
    ref_fills = {(int(e["row"]) - 1, e["field"]): str(e["new_value"])
                 for e in ref_log if e["field"] in common_fields}
    eng_fills = {(int(row["row_id"]) - 1, row["field"]): row["new_value"]
                 for _, row in eng_log.iterrows()
                 if row["field"] in common_fields}
    n_ref9 = sum(1 for e in ref_log if e["field"] not in common_fields)
    n_eng9 = sum(1 for _, row in eng_log.iterrows()
                 if row["field"] not in common_fields)

    fillable_ref = fillable_cells(
        fixture, master_keys(fixture, "X_EMAIL2", "ref"), common_fields,
        "ref")
    fillable_eng = fillable_cells(
        fixture, master_keys(fixture, "EMAIL", "eng"), common_fields,
        "eng")
    counts = {"equal": 0, "divergence_5_6": 0, "divergence_9": n_ref9
              + n_eng9, "UNDOCUMENTED": 0}
    bad = []
    for cell in set(ref_fills) | set(eng_fills):
        rv, ev = ref_fills.get(cell), eng_fills.get(cell)
        if rv is not None and cell not in fillable_ref:
            counts["UNDOCUMENTED"] += 1
            bad.append(("ref fill not fillable", cell, rv))
        elif ev is not None and cell not in fillable_eng:
            counts["UNDOCUMENTED"] += 1
            bad.append(("eng fill not fillable", cell, ev))
        elif rv is not None and ev is not None:
            if rv == ev:
                counts["equal"] += 1
            elif ev in fillable_eng.get(cell, set()) and \
                    rv in fillable_ref.get(cell, set()):
                counts["divergence_5_6"] += 1  # different winning candidate
            else:
                counts["UNDOCUMENTED"] += 1
                bad.append(("values outside candidates", cell, rv, ev))
        elif rv is None and cell in fillable_ref:
            counts["divergence_5_6"] += 1  # ref's winner skipped this field
        elif ev is None and cell in fillable_eng:
            counts["divergence_5_6"] += 1
        else:
            counts["divergence_9"] += 1  # fillable under one side's keys only
    print(f"[parity] fill lane ({variant}) cell classes:", counts)
    for b in bad[:10]:
        print("[parity]   UNDOCUMENTED:", b)
    if counts["UNDOCUMENTED"] > 0:
        failures.append(
            f"fill lane ({variant}): {counts['UNDOCUMENTED']} fill(s) "
            "outside the documented divergence classes")
    if len(eng_log) == 0:
        failures.append(f"fill lane ({variant}): engine made no fills "
                        "— vacuous")
    if variant == "natural" and len(ref_log) == 0:
        # not a failure — the measured divergence-#9 evidence: keyed on
        # the ~empty X_EMAIL2, the reference's fill stage is a NO-OP on
        # its own master + its own sources even with working headers
        print("[parity] fill lane: reference made ZERO fills on its own "
              "data (X_EMAIL2 keying) — divergence #9, measured")
    if variant == "aligned-email":
        # with the email roles aligned, BOTH sides fill on the same keys:
        # the common surface must produce genuinely identical fills, or
        # the lane is not comparing the J2 match/fill mechanics at all
        if len(ref_log) == 0:
            failures.append(
                "fill lane (aligned-email): reference still made no "
                "fills — the variant is not exercising matching")
        if counts["equal"] == 0:
            failures.append(
                "fill lane (aligned-email): no identical fills on the "
                "common surface — vacuous match/fill comparison")


def main():
    sandbox = tempfile.mkdtemp(prefix="parity_")
    os.symlink(os.path.join(REF, "cleaning"),
               os.path.join(sandbox, "cleaning"))
    os.makedirs(os.path.join(sandbox, "output"))

    # fixture: first N master rows, headers UPPERCASED so the reference's
    # exact-name role matches engage (the intended-semantics regime)
    full = pd.read_csv(os.path.join(REF, "output", "MergedDatabase.tsv"),
                       sep="\t", dtype=str, keep_default_na=False)
    fixture = full.head(N_ROWS).copy()
    fixture.columns = [c.upper() for c in fixture.columns]
    fixture_path = os.path.join(sandbox, "output", "MergedDatabase.tsv")
    fixture.to_csv(fixture_path, sep="\t", index=False)
    print(f"[parity] fixture: {len(fixture)} rows x "
          f"{len(fixture.columns)} cols -> {fixture_path}")

    # run the REFERENCE pipeline: importing the module executes its
    # module-level main (reads <sandbox>/output/MergedDatabase.tsv, writes
    # <cwd>/output/cleaned_contacts.tsv)
    cwd = os.getcwd()
    os.chdir(sandbox)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_clean", os.path.join(sandbox, "cleaning",
                                      "clean_contacts.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # stage-1 frame: the reference's clean_fields alone on a fresh read
        ref_clean = mod.clean_fields(
            pd.read_csv(fixture_path, sep="\t"))
    finally:
        os.chdir(cwd)
    ref_golden = read_tsv_str(
        os.path.join(sandbox, "output", "cleaned_contacts.tsv"))
    print(f"[parity] reference ran: clean={len(ref_clean)} rows, "
          f"golden={len(ref_golden)} rows")

    # run the ENGINE stages on the same fixture
    eng_prefix = os.path.join(sandbox, "engine")
    r = subprocess.run(
        ["sbt", "-batch",
         f"runMain graft.ParityDump {fixture_path} {eng_prefix}"],
        cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        sys.exit("[parity] engine ParityDump failed")
    eng_clean = read_tsv_str(eng_prefix + ".clean.tsv")
    eng_golden = read_tsv_str(eng_prefix + ".golden.tsv")
    print(f"[parity] engine ran: clean={len(eng_clean)} rows, "
          f"golden={len(eng_golden)} rows")

    failures = []

    # ---- stage 1: cleaned frame, row-by-row joined on SEQNO ----
    assert len(ref_clean) == len(eng_clean), "clean-stage row counts differ"
    ref1 = ref_clean.copy()
    ref1.columns = [c.upper() for c in ref1.columns]
    ref_clean_full = ref1.copy()  # unfiltered, for the key accounting
    # the join key must be unique on both sides (.loc would return frames);
    # real exports carry a few duplicated SEQNOs — drop them from the
    # row-level compare and say so
    ref1 = ref1.set_index(ref1["SEQNO"].map(cell))
    eng1 = eng_clean.set_index(eng_clean["SEQNO"])
    dup = set(ref1.index[ref1.index.duplicated()]) | \
        set(eng1.index[eng1.index.duplicated()])
    # rows whose SEQNO is duplicated (blank/reused keys in the raw export)
    # cannot row-join and are skipped IDENTICALLY on both sides; a key
    # present on only ONE side, however, means the two readers sliced a
    # row differently — that is real divergence and is hard-bounded at 0
    side_diff = set(ref1.index) ^ set(eng1.index)
    assert not side_diff, \
        f"stage 1: SEQNO keys on one side only: {sorted(side_diff)[:5]}"
    common = (set(ref1.index) & set(eng1.index)) - dup
    if dup:
        print(f"[parity] stage 1: skipping {len(ref1) - len(common)} "
              f"row(s) with duplicated SEQNO keys ({len(dup)} keys)")
    ref1 = ref1[ref1.index.isin(common)]
    eng1 = eng1[eng1.index.isin(common)]
    counts = {}
    samples = {}
    shared = [c for c in ref1.columns if c in eng1.columns]
    for seq in ref1.index:
        rrow, erow = ref1.loc[seq], eng1.loc[seq]
        for c in shared:
            cls = classify(c, cell(rrow[c]), erow[c])
            counts[cls] = counts.get(cls, 0) + 1
            if cls != "equal" and cls not in ("format_ts", "format_num"):
                samples.setdefault(cls, []).append(
                    (seq, c, cell(rrow[c]), erow[c]))
    print("[parity] stage 1 (clean) cell classes:",
          {k: v for k, v in sorted(counts.items())})
    for cls in ("divergence_2", "divergence_7"):
        if counts.get(cls, 0) == 0:
            failures.append(f"stage 1 never exercised {cls} — vacuous pin")
    if counts.get("UNDOCUMENTED", 0) > 0:
        for s in samples["UNDOCUMENTED"][:10]:
            print("[parity]   UNDOCUMENTED:", s)
        failures.append(
            f"stage 1: {counts['UNDOCUMENTED']} cell(s) differ outside "
            "the documented divergence classes")

    # ---- stage 2: golden records, EMAIL-keyed subset ----
    # (fallback name+mobile keys are themselves polluted by divergence #2
    # on the reference side, so grouping differs there by documented
    # design; the email-keyed groups are identical by construction)
    refg = ref_golden.copy()
    refg.columns = [c.upper() for c in refg.columns]
    refg = refg[refg["EMAIL"] != ""].set_index("EMAIL", drop=False)
    engg = eng_golden[eng_golden["EMAIL"] != ""].set_index("EMAIL",
                                                           drop=False)
    assert sorted(refg.index) == sorted(engg.index), \
        "email-keyed golden key sets differ"
    # group candidate sets for the merge-tie classes
    ref_groups = {c: ref1[ref1["EMAIL"].map(cell) != ""]
                  .groupby(ref1["EMAIL"].map(cell))[c]
                  .apply(lambda s: {cell(v) for v in s} - {""})
                  for c in shared}
    eng_groups = {c: eng1[eng1["EMAIL"] != ""]
                  .groupby(eng1["EMAIL"])[c]
                  .apply(lambda s: set(s) - {""})
                  for c in shared}
    g_counts = {}
    g_samples = []
    for email in refg.index:
        rrow, erow = refg.loc[email], engg.loc[email]
        for c in shared:
            rmembers = ref_groups[c].get(email, set())
            emembers = eng_groups[c].get(email, set())
            cls = classify(c, cell(rrow[c]), erow[c], rmembers, emembers)
            g_counts[cls] = g_counts.get(cls, 0) + 1
            if cls == "UNDOCUMENTED":
                g_samples.append((email, c, cell(rrow[c]), erow[c],
                                  sorted(rmembers)[:3]))
    print("[parity] stage 2 (golden, email-keyed) cell classes:",
          {k: v for k, v in sorted(g_counts.items())})

    # golden-total accounting: each side's output row count must equal the
    # distinct dedup-key count computed from ITS OWN cleaned frame under
    # ITS OWN key semantics (reference: raw-lower email, 'Nan'-polluted
    # fullname + raw mobile fallback; engine: sentinel-gated normalized
    # keys with last-10 phone) — so the 2069-vs-2067-style delta is a
    # MECHANICAL consequence of divergences #2/#7, not an unexplained gap
    def ref_key(r):
        e = cell(r["EMAIL"]).lower()
        if e:
            return e
        return cell(r["FULLNAME"]).lower() + "-" + cell(r["MOBILE"])

    def eng_key(r):
        e = r["EMAIL"].strip().lower()
        if e and not eng_missing(r["EMAIL"]):
            return e
        fn = r["FULLNAME"]
        mb = r["MOBILE"]
        fns = re.sub(r"\s+", " ", fn.strip()).lower() \
            if not eng_missing(fn) else ""
        mbs = norm_phone_key(mb) if not eng_missing(mb) else ""
        return fns + "-" + mbs

    ref_nkeys = len({ref_key(r) for _, r in ref_clean_full.iterrows()})
    eng_nkeys = len({eng_key(r) for _, r in eng_clean.iterrows()})
    print(f"[parity] golden totals: reference={len(ref_golden)} "
          f"(distinct ref-semantics keys: {ref_nkeys}) "
          f"engine={len(eng_golden)} "
          f"(distinct eng-semantics keys: {eng_nkeys})")
    if len(ref_golden) != ref_nkeys:
        failures.append(
            f"golden accounting: reference rows {len(ref_golden)} != "
            f"its own distinct keys {ref_nkeys}")
    if len(eng_golden) != eng_nkeys:
        failures.append(
            f"golden accounting: engine rows {len(eng_golden)} != "
            f"its own distinct keys {eng_nkeys}")
    if g_counts.get("UNDOCUMENTED", 0) > 0:
        for s in g_samples[:10]:
            print("[parity]   UNDOCUMENTED:", s)
        failures.append(
            f"stage 2: {g_counts['UNDOCUMENTED']} golden cell(s) differ "
            "outside the documented divergence classes")

    # ---- stage 2b: both validators over the engine's golden TSV ----
    validate_lane(eng_prefix, failures)

    # ---- stage 3: the fill stage against the reference's own run ----
    # natural: the reference's own key surface (measures the #9 no-op)
    fill_lane(fixture, failures, "natural")
    # aligned-email: plant X_EMAIL2 := EMAIL so BOTH sides match on the
    # same email keys — the variant that actually exercises the J2
    # match + first-match-wins fill mechanics on the common surface
    aligned = fixture.copy()
    aligned["X_EMAIL2"] = aligned["EMAIL"]
    fill_lane(aligned, failures, "aligned-email")

    if failures:
        for f in failures:
            print("[parity] FAIL:", f)
        sys.exit(1)
    print("[parity] green — every difference is a documented divergence")


if __name__ == "__main__":
    main()
