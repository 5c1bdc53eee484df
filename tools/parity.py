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
import time

import pandas as pd

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_ROWS = int(os.environ.get("PARITY_ROWS", "2500"))


def run_engine_batch(jobs):
    """ALL engine dumps in ONE sbt/Spark JVM (graft.ParityAll): the lane
    inputs are independent of each other and of the reference runs, so
    the harness prepares every sandbox first and pays sbt + Spark
    startup once instead of per lane (~8 launches before r12)."""
    sb = tempfile.mkdtemp(prefix="paritymanifest_")
    manifest = os.path.join(sb, "manifest.tsv")
    with open(manifest, "w") as f:
        for job in jobs:
            f.write("\t".join(job) + "\n")
    t0 = time.time()
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.ParityAll {manifest}"],
        cwd=REPO, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-3000:])
        sys.exit("[parity] engine ParityAll batch failed")
    print(f"[parity] engine batch: {len(jobs)} dump lanes in one JVM "
          f"({time.time() - t0:.0f}s)")

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


def run_ref_fill_script(fixture, script):
    """Run one of the reference's fill scripts (the in-memory
    fill_missing_contacts.py or the SQLite-staged
    fill_missing_contacts_large.py — both read output/MergedDatabase.tsv
    + data_files/ and write output/fill_missing_log.json with identical
    record shapes) in its own sandbox; returns its change log."""
    import json
    cwd = os.getcwd()
    sb = tempfile.mkdtemp(prefix="parityref_")
    os.symlink(os.path.join(REF, "cleaning"), os.path.join(sb, "cleaning"))
    os.symlink(os.path.join(REF, "data_files"),
               os.path.join(sb, "data_files"))
    os.makedirs(os.path.join(sb, "output"))
    fixture.to_csv(os.path.join(sb, "output", "MergedDatabase.tsv"),
                   sep="\t", index=False)
    spec = importlib.util.spec_from_file_location(
        "ref_fill_" + script.replace(".", "_"),
        os.path.join(sb, "cleaning", script))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # main() is __main__-guarded: no side run
    os.chdir(sb)
    try:
        mod.main()
    finally:
        os.chdir(cwd)
    return json.load(open(os.path.join(sb, "output",
                                       "fill_missing_log.json")))


def fill_prepare(fixture):
    """Sandbox + ParityAll job for one fill lane; returns (job, eng_prefix)."""
    sb = tempfile.mkdtemp(prefix="parityfill_")
    pristine = os.path.join(sb, "master_orig.tsv")
    fixture.to_csv(pristine, sep="\t", index=False)
    eng_prefix = os.path.join(sb, "engine")
    job = ("fill", pristine, os.path.join(REF, "data_files"), eng_prefix)
    return job, eng_prefix


def fill_lane(fixture, failures, variant, eng_prefix):
    """Reference fill stage vs engine Fill.fillFromSources on the same
    fixture + the reference's real data_files sources — BOTH reference
    variants: the in-memory fill_missing_contacts.py AND the
    SQLite-staged fill_missing_contacts_large.py (identical key
    semantics — same normalize/normalize_phone/get_full_name, same
    X_EMAIL2 surface — different iteration direction: per-master-row
    first-candidate-wins vs per-source-row update-all-matches; the
    reference's own engine-portability thesis, SURVEY §3.3). Fill
    results are ordering-dependent (#5 listdir vs sorted sources, #6
    first-match-wins candidate order) and key-surface-dependent (#9
    X_EMAIL2 vs EMAIL; FULLNAME never a reference fill target), so the
    lane compares the common fill surface {FIRSTNAME, LASTNAME, MOBILE}
    against the order-independent FILLABLE closure under each side's own
    key semantics: every fill must be fillable under its side's keys
    (else UNDOCUMENTED), asymmetries and value differences must sit
    inside the candidate sets (#5/#6) or the email-role split (#9).
    The closure is shared by both reference variants (same keys), so
    one engine run and one closure computation grade both.

    `eng_prefix` points at the engine dump ALREADY produced by the
    ParityAll batch ([[fill_prepare]] builds the sandbox + job)."""
    eng_log = read_tsv_str(eng_prefix + ".filllog.tsv")
    print(f"[parity] fill lane ({variant}): engine made {len(eng_log)} fills")

    common_fields = ["FIRSTNAME", "LASTNAME", "MOBILE"]
    fillable_ref = fillable_cells(
        fixture, master_keys(fixture, "X_EMAIL2", "ref"), common_fields,
        "ref")
    fillable_eng = fillable_cells(
        fixture, master_keys(fixture, "EMAIL", "eng"), common_fields,
        "eng")
    for script, tag in [("fill_missing_contacts.py", "in-memory"),
                        ("fill_missing_contacts_large.py",
                         "sqlite-staged")]:
        ref_log = run_ref_fill_script(fixture, script)
        if tag == "sqlite-staged":
            # divergence #11 (reference bug, surfaced by the full-master
            # run): fill_missing_contacts_large.py:63 computes
            # orig_index = chunk.index + (chunk_num-1)*chunk_size, but a
            # pandas chunked reader's chunk.index is ALREADY global, so
            # every row past the first 10k-row chunk logs a row id
            # shifted +10k per chunk (row 10252 reports as 20253). The
            # SQL updates key on the same self-consistent ids, so the
            # FILLS land on the right rows — only the reported ids lie.
            # Invert: global g in chunk k maps to o = g + k*10000, so
            # g = o - (o // 20000) * 10000.
            remapped = 0
            for e in ref_log:
                o = int(e["row"]) - 1
                g = o - (o // 20000) * 10000
                if g != o:
                    e["row"] = g + 1
                    remapped += 1
            if remapped:
                print(f"[parity] fill lane ({variant}/{tag}): remapped "
                      f"{remapped} double-shifted row ids (divergence "
                      "#11, reference chunked-index bug)")
        print(f"[parity] fill lane ({variant}/{tag}): reference made "
              f"{len(ref_log)} fills")
        classify_fill_logs(fixture, ref_log, eng_log, fillable_ref,
                           fillable_eng, common_fields, failures,
                           f"{variant}/{tag}")


def classify_fill_logs(fixture, ref_log, eng_log, fillable_ref,
                       fillable_eng, common_fields, failures, variant):
    ref_fills = {(int(e["row"]) - 1, e["field"]): str(e["new_value"])
                 for e in ref_log if e["field"] in common_fields}
    eng_fills = {(int(row["row_id"]) - 1, row["field"]): row["new_value"]
                 for _, row in eng_log.iterrows()
                 if row["field"] in common_fields}
    n_ref9 = sum(1 for e in ref_log if e["field"] not in common_fields)
    n_eng9 = sum(1 for _, row in eng_log.iterrows()
                 if row["field"] not in common_fields)
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
    if variant.startswith("natural") and len(ref_log) == 0:
        # not a failure — the measured divergence-#9 evidence: keyed on
        # the ~empty X_EMAIL2, the reference's fill stage is a NO-OP on
        # its own master + its own sources even with working headers
        print(f"[parity] fill lane ({variant}): reference made ZERO fills "
              "on its own data (X_EMAIL2 keying) — divergence #9, measured")
    if variant.startswith("aligned-email"):
        # with the email roles aligned, BOTH sides fill on the same keys:
        # the common surface must produce genuinely identical fills, or
        # the lane is not comparing the J2 match/fill mechanics at all
        if len(ref_log) == 0:
            failures.append(
                f"fill lane ({variant}): reference still made no "
                "fills — the variant is not exercising matching")
        if counts["equal"] == 0:
            failures.append(
                f"fill lane ({variant}): no identical fills on the "
                "common surface — vacuous match/fill comparison")


# ---------------------------------------------------------- J1 mailchimp lane

def parsed_view(series):
    """Model the pandas NON-dtype=str read merge_contacts_kindaworks.py
    uses: default NA tokens -> '' (post-fillna view), all-numeric columns
    parse to int64 (no NAs) or float64 (with NAs) and stringify the
    pandas way ('412345678' / '412345678.0'); anything else stays raw."""
    vals = [ref_view(v) for v in series]
    nn = [v for v in vals if v != ""]

    def fnum(s):
        try:
            return float(s)
        except ValueError:
            return None
    if nn and all(fnum(v) is not None for v in nn):
        has_na = len(nn) < len(vals)
        allint = all("." not in v and "e" not in v.lower() for v in nn)
        if allint and not has_na:
            return [str(int(float(v))) for v in vals]
        return ["" if v == "" else str(float(v)) for v in vals]
    return vals


def j1_norm(v):
    """merge_contacts_kindaworks.py:22-25 normalize: strip+lower only —
    no whitespace collapse, phones never digit-normalized."""
    return str(v).strip().lower()


def j1_ref_mc_columns(mc):
    """(name, mobile, email) raw series under the reference's get_name /
    get_mobile / get_email probing over LOWERED headers
    (merge_contacts_kindaworks.py:27-57)."""
    cols = {c.strip().lower(): c for c in mc.columns}

    def parsed(name):
        return parsed_view(mc[cols[name]])
    n = len(mc)
    if "firstname" in cols and "lastname" in cols:
        name = [f"{f} {l}".strip() for f, l in
                zip(parsed("firstname"), parsed("lastname"))]
    elif "first name" in cols and "last name" in cols:
        name = [f"{f} {l}".strip() for f, l in
                zip(parsed("first name"), parsed("last name"))]
    elif "fullname" in cols:
        name = [v.strip() for v in parsed("fullname")]
    elif "name" in cols:
        name = [v.strip() for v in parsed("name")]
    else:
        name = [""] * n
    if "mobile" in cols:
        mobile = parsed("mobile")
    elif "number" in cols:
        mobile = parsed("number")
    else:
        mobile = [""] * n
    if "email address" in cols:
        email = parsed("email address")
    elif "email" in cols:
        email = parsed("email")
    else:
        email = [""] * n
    return name, mobile, email


def j1_expected_ref(fixture, mc):
    """Exact simulation of merge_contacts_kindaworks.py:59-96 on the
    fixture master + mc export: {(row_pos, 'EMAIL'|'MOBILE'): value}.
    Deterministic — one source file, fixed row order, match.iloc[0]."""
    mc_name, mc_mobile, mc_email = j1_ref_mc_columns(mc)
    mkeys = [(j1_norm(n), j1_norm(m), j1_norm(e))
             for n, m, e in zip(mc_name, mc_mobile, mc_email)]
    by_nm = {}
    by_ne = {}
    for j, (n, m, e) in enumerate(mkeys):
        by_nm.setdefault((n, m), j)  # first row in file order wins
        by_ne.setdefault((n, e), j)
    m_first = parsed_view(fixture["FIRSTNAME"])
    m_last = parsed_view(fixture["LASTNAME"])
    m_email = parsed_view(fixture["EMAIL"])
    m_mobile = parsed_view(fixture["MOBILE"])
    fills = {}
    for i in range(len(fixture)):
        name = j1_norm(f"{m_first[i]} {m_last[i]}".strip())
        if not name:
            continue
        email_n, mobile_n = j1_norm(m_email[i]), j1_norm(m_mobile[i])
        if m_email[i].strip() == "":
            j = by_nm.get((name, mobile_n))
            if j is not None and mc_email[j] != "":
                fills[(i, "EMAIL")] = mc_email[j]
        if m_mobile[i].strip() == "":
            j = by_ne.get((name, email_n))
            if j is not None and mc_mobile[j] != "":
                fills[(i, "MOBILE")] = mc_mobile[j]
    return fills


# engine role-candidate lists (Roles.scala, case-insensitive; the mc
# frame's headers are lowered by applyMailchimp before resolution)
ENG_FIRST = ["first name", "firstname", "first_name"]
ENG_LAST = ["last name", "lastname", "last_name"]
ENG_FULL = ["full name", "fullname", "name"]
ENG_EMAIL = ["email address", "email", "x_email2"]
ENG_PHONE = ["phone number", "phone", "mobile", "number"]


def eng_role(columns, candidates):
    by_lower = {}
    for c in columns:
        by_lower.setdefault(c.strip().lower(), c)
    for cand in candidates:
        if cand in by_lower:
            return by_lower[cand]
    return None


def j1_expected_eng(fixture, mc):
    """Exact simulation of ContactsApp.applyMailchimp / Fill.mailchimpFill:
    {(row_pos, 'EMAIL'|'MOBILE'): value}. Keys are the engine's P5 norms
    (collapse+lower name with sentinel-gated FULLNAME fallback, trim+lower
    email, digits-last-10 phone); both join keys must be NON-EMPTY; the
    first mc row (file order) with a PRESENT value wins per key pair."""
    def mc_col(cands):
        c = eng_role(mc.columns, cands)
        return [str(v) for v in mc[c]] if c else [""] * len(mc)
    mc_first, mc_last = mc_col(ENG_FIRST), mc_col(ENG_LAST)
    mc_full = mc_col(ENG_FULL)
    mc_email, mc_phone = mc_col(ENG_EMAIL), mc_col(ENG_PHONE)
    mkeys = [row_keys(f, l, fu, e, p, "eng") for f, l, fu, e, p in
             zip(mc_first, mc_last, mc_full, mc_email, mc_phone)]
    by_np = {}
    by_ne = {}
    for j, (n, e, p) in enumerate(mkeys):
        if n and p and not eng_missing(mc_email[j]):
            by_np.setdefault((n, p), mc_email[j])
        if n and e and not eng_missing(mc_phone[j]):
            by_ne.setdefault((n, e), mc_phone[j])
    fills = {}
    for i, (_, r) in enumerate(fixture.iterrows()):
        n, e, p = row_keys(r["FIRSTNAME"], r["LASTNAME"], r["FULLNAME"],
                           r["EMAIL"], r["MOBILE"], "eng")
        if eng_missing(r["EMAIL"]) and n and p:
            v = by_np.get((n, p))
            if v is not None:
                fills[(i, "EMAIL")] = v
        if eng_missing(r["MOBILE"]) and n and e:
            v = by_ne.get((n, e))
            if v is not None:
                fills[(i, "MOBILE")] = v
    return fills


def j1_value_eq(col, a, b):
    if a == b or num_equal(a, b):
        return True
    # cross-side phone serialization (ref writes the pandas-parsed float,
    # engine the raw string): same digits = same phone
    return col == "MOBILE" and digits(a) != "" and digits(a) == digits(b)


def mailchimp_prepare(fixture, mc_path_or_df):
    """Sandbox + ParityAll job for one Mailchimp lane; returns
    (job, ctx) — ctx carries what [[mailchimp_lane]] needs to run the
    reference and compare."""
    sb = tempfile.mkdtemp(prefix="paritymc_")
    os.symlink(os.path.join(REF, "cleaning"), os.path.join(sb, "cleaning"))
    os.makedirs(os.path.join(sb, "data_sources"))
    os.makedirs(os.path.join(sb, "output"))
    mc_dst = os.path.join(sb, "data_sources", "mailchimpclean.tsv")
    if isinstance(mc_path_or_df, str):
        os.symlink(mc_path_or_df, mc_dst)
        mc = read_tsv_str(mc_path_or_df)
    else:
        mc_path_or_df.to_csv(mc_dst, sep="\t", index=False)
        mc = mc_path_or_df.astype(str)
    master_path = os.path.join(sb, "output", "MergedDatabase.tsv")
    pristine = os.path.join(sb, "master_orig.tsv")
    fixture.to_csv(master_path, sep="\t", index=False)
    fixture.to_csv(pristine, sep="\t", index=False)
    eng_prefix = os.path.join(sb, "engine")
    ctx = {"sb": sb, "master_path": master_path, "mc": mc,
           "eng_prefix": eng_prefix}
    return ("mailchimp", pristine, mc_dst, eng_prefix), ctx


def mailchimp_lane(fixture, ctx, failures, variant):
    """J1: the reference's merge_contacts_kindaworks.py executed unmodified
    vs the engine's ContactsApp.applyMailchimp (Fill.mailchimpFill) on the
    same master fixture + Mailchimp export. BOTH sides are deterministic
    (single source, fixed row order, first-match-wins), so each side is
    held to an EXACT simulation of its own semantics; cross-side cell
    differences then classify into the documented key-surface divergence
    (#10: 'mobile'/'number' exact-name probing vs candidate-list roles,
    ''=='' vacuous second key vs two non-empty keys, raw strip-lower
    phone keys vs digits-last-10) plus the read-formatting classes.

    The engine output already exists at ctx['eng_prefix'] (ParityAll
    batch); this function runs the reference and classifies."""
    cwd = os.getcwd()
    sb, mc = ctx["sb"], ctx["mc"]
    # the reference script runs at import (module-level main); its paths
    # are cwd-relative
    os.chdir(sb)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_mc", os.path.join(sb, "cleaning",
                                   "merge_contacts_kindaworks.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        os.chdir(cwd)
    ref_out = read_tsv_str(ctx["master_path"])  # overwritten in place
    ref_out.columns = [c.upper() for c in ref_out.columns]

    eng_out = read_tsv_str(ctx["eng_prefix"] + ".mcfilled.tsv")
    eng_out = eng_out.sort_values(
        by="row_id", key=lambda s: s.astype(int)).reset_index(drop=True)
    assert len(ref_out) == len(eng_out) == len(fixture), \
        f"mailchimp lane ({variant}): row counts diverged"

    exp_ref = j1_expected_ref(fixture, mc)
    exp_eng = j1_expected_eng(fixture, mc)
    print(f"[parity] mailchimp lane ({variant}): reference expected "
          f"{len(exp_ref)} fills, engine expected {len(exp_eng)} fills")

    shared = [c for c in fixture.columns if c in eng_out.columns
              and c in ref_out.columns]
    counts = {"equal": 0, "fill_equal": 0, "divergence_2": 0,
              "divergence_10": 0, "format_num": 0, "format_ts": 0,
              "UNDOCUMENTED": 0}
    bad = []
    for i in range(len(fixture)):
        for c in shared:
            rv = cell(ref_out.iloc[i][c])
            ev = str(eng_out.iloc[i][c])
            orig = str(fixture.iloc[i][c])
            r_fill = exp_ref.get((i, c))
            e_fill = exp_eng.get((i, c))
            # each side must equal ITS OWN simulation on the fill surface
            if c in ("EMAIL", "MOBILE"):
                want_r = (str(r_fill) if r_fill is not None
                          else ref_view(orig))
                if not (rv == want_r or num_equal(rv, want_r)):
                    counts["UNDOCUMENTED"] += 1
                    bad.append(("ref != ref-simulation", i, c, rv, want_r))
                    continue
                want_e = str(e_fill) if e_fill is not None else orig
                if ev != want_e:
                    counts["UNDOCUMENTED"] += 1
                    bad.append(("eng != eng-simulation", i, c, ev, want_e))
                    continue
            if rv == ev:
                counts["equal"] += 1
            elif (r_fill is not None or e_fill is not None) \
                    and c in ("EMAIL", "MOBILE"):
                if r_fill is not None and e_fill is not None and \
                        j1_value_eq(c, str(r_fill), str(e_fill)):
                    counts["fill_equal"] += 1
                else:
                    counts["divergence_10"] += 1  # key-surface split
            elif rv == "" and orig.strip() in PANDAS_NA | {""} or \
                    rv == "" and orig.strip() == "":
                counts["divergence_2"] += 1  # ref's NA-read nulled it
            elif num_equal(rv, ev):
                counts["format_num"] += 1
            elif ts_equal(rv, ev) and rv != "" and ev != "":
                counts["format_ts"] += 1
            elif rv == strip_nan_tokens(ev) or \
                    strip_nan_tokens(rv) == strip_nan_tokens(ev):
                counts["divergence_2"] += 1
            else:
                counts["UNDOCUMENTED"] += 1
                bad.append(("cell", i, c, rv, ev))
    print(f"[parity] mailchimp lane ({variant}) cell classes:", counts)
    for b in bad[:10]:
        print("[parity]   UNDOCUMENTED:", b)
    if counts["UNDOCUMENTED"] > 0:
        failures.append(
            f"mailchimp lane ({variant}): {counts['UNDOCUMENTED']} "
            "cell(s) outside the documented classes")
    if variant == "aligned":
        if not exp_ref or not exp_eng:
            failures.append(
                "mailchimp lane (aligned): a side made no fills — the "
                "2-key match is not firing")
        if counts["fill_equal"] + sum(
                1 for k, v in exp_ref.items()
                if k in exp_eng and j1_value_eq(k[1], str(v),
                                                str(exp_eng[k]))) == 0:
            failures.append(
                "mailchimp lane (aligned): no identical fills — vacuous")


def mailchimp_aligned(fixture):
    """Aligned J1 fixture: every 3rd master row with a full contact
    (first, last, email, mobile all present) donates its contact to a
    synthetic Mailchimp export whose headers BOTH sides resolve
    ('firstname'/'lastname'/'email'/'mobile'), then has its EMAIL (odd
    donors) or MOBILE (even donors) blanked in the master — so the 2-key
    match genuinely fires on both sides and fills must round-trip the
    donated values."""
    m = fixture.copy()
    donors = []
    k = 0
    for i in range(len(m)):
        f, l = str(m.iloc[i]["FIRSTNAME"]), str(m.iloc[i]["LASTNAME"])
        e, mo = str(m.iloc[i]["EMAIL"]), str(m.iloc[i]["MOBILE"])
        if any(ref_view(v) == "" or eng_missing(v) for v in (f, l, e, mo)):
            continue
        k += 1
        if k % 3 != 0:
            continue
        donors.append({"firstname": f, "lastname": l, "email": e,
                       "mobile": mo})
        col = "EMAIL" if k % 2 == 1 else "MOBILE"
        m.iloc[i, m.columns.get_loc(col)] = ""
    mc = pd.DataFrame(donors,
                      columns=["firstname", "lastname", "email", "mobile"])
    return m, mc


# ------------------------------------------------------ run.py ordering lane

def pipeline_fixture():
    """Tie-free synthetic master + one source file for the whole-pipeline
    lane: every divergence class is engineered OUT (X_EMAIL2 := EMAIL so
    both fill keys coincide, single-space names, no missing name/address
    cells to astype-pollute, zero-lead-free all-digit phones so the
    reference's non-dtype re-read re-serializes identically, unique
    longest value per merged column) — so the two pipelines must agree
    EXACTLY, stage handoff included."""
    cols = ["SEQNO", "FIRSTNAME", "LASTNAME", "FULLNAME", "EMAIL",
            "X_EMAIL2", "MOBILE", "ADDRESS", "LAST_UPDATED"]
    rows = [
        ("1", "Alice", "Price", "Alice Price", "alice@x.com", "",
         "5550000001", "1 Low St", "2023-01-01 10:00:00"),
        # missing MOBILE -> fillable from s1 row a by (name, email)
        ("2", "Bob", "Reed", "Bob Reed", "bob@x.com", "",
         "", "2 Main St", "2023-01-02 10:00:00"),
        # missing FIRSTNAME -> fillable from s1 row b by (email, phone)
        ("3", "", "Smith", "Carol Smith", "carol@x.com", "",
         "5550000003", "3 Oak St", "2023-01-03 10:00:00"),
        # invalid email -> nullified by clean, reported by validate;
        # the formatted phone keeps the MOBILE column object-typed in
        # the reference's non-dtype re-read — an ALL-numeric MOBILE
        # column makes clean_contacts.py:175 crash outright on its
        # str-concat dedup key (int64 + str), a real reference
        # fragility this lane found
        ("4", "Dan", "Wu", "Dan Wu", "not-an-email", "",
         "555-000-0004", "4 Elm St", "2023-01-04 10:00:00"),
        # missing email + invalid phone -> two validation errors
        ("5", "Eve", "Yang", "Eve Yang", "", "",
         "123", "5 Fir St", "2023-01-05 10:00:00"),
        # dedup pair on frank@x.com: '60' wins SEQNO by length, row 7
        # wins ADDRESS by length and LAST_UPDATED by recency — no ties
        ("60", "Frank", "Zhou", "Frank Zhou", "frank@x.com", "",
         "5550000006", "9 A St", "2023-01-06 10:00:00"),
        ("7", "Frank", "Zhou", "Frank Zhou", "frank@x.com", "",
         "5550000006", "99 Arlington Avenue", "2023-05-05 10:00:00"),
    ]
    m = pd.DataFrame(rows, columns=cols)
    m["X_EMAIL2"] = m["EMAIL"]  # align the #9 email-key split away
    src = pd.DataFrame(
        [("Bob", "Reed", "bob@x.com", "5550000002"),
         ("Carol", "Smith", "carol@x.com", "5550000003")],
        columns=["FirstName", "LastName", "Email", "Mobile"])
    return m, src


def pipeline_prepare():
    """Sandbox + ParityAll job for the run.py-ordering lane; returns
    (job, ctx)."""
    master, src = pipeline_fixture()
    sb = tempfile.mkdtemp(prefix="parityrun_")
    os.symlink(os.path.join(REF, "cleaning"), os.path.join(sb, "cleaning"))
    os.makedirs(os.path.join(sb, "data_files"))
    os.makedirs(os.path.join(sb, "output"))
    src.to_csv(os.path.join(sb, "data_files", "s1.tsv"), sep="\t",
               index=False)
    master_path = os.path.join(sb, "output", "MergedDatabase.tsv")
    pristine = os.path.join(sb, "master_orig.tsv")
    master.to_csv(master_path, sep="\t", index=False)
    master.to_csv(pristine, sep="\t", index=False)
    eng_out = os.path.join(sb, "eng_out")
    ctx = {"sb": sb, "eng_out": eng_out}
    return ("run", pristine, os.path.join(sb, "data_files"), eng_out), ctx


def pipeline_lane(failures, ctx):
    """run.py-ordering lane: the reference's full fill -> clean ->
    validate sequence (its scripts executed unmodified, in run.py's
    order, against the SAME artifact paths run.py hands off —
    fill REWRITES output/MergedDatabase.tsv in place, clean reads the
    rewritten master, validate reads clean's output) vs the engine's
    ContactsApp.run on the tie-free fixture (already dumped by the
    ParityAll batch at ctx['eng_out']). On this fixture every
    artifact must agree: same fills, same cleaned cells, same
    validation reports."""
    import json
    cwd = os.getcwd()
    sb = ctx["sb"]

    # the exact run.py step list (cleaning/run.py:83-87), same order, same
    # artifact handoff; fill/validate expose main(), clean runs at import
    os.chdir(sb)
    try:
        for script in ("fill_missing_contacts.py", "clean_contacts.py",
                       "validate_fields.py"):
            spec = importlib.util.spec_from_file_location(
                "ref_run_" + script.replace(".", "_"),
                os.path.join(sb, "cleaning", script))
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            if hasattr(mod, "main"):
                mod.main()
    finally:
        os.chdir(cwd)
    ref_fills = json.load(open(os.path.join(sb, "output",
                                            "fill_missing_log.json")))
    ref_clean = read_tsv_str(os.path.join(sb, "output",
                                          "cleaned_contacts.tsv"))
    ref_val = json.load(open(os.path.join(sb, "output",
                                          "validation_errors.json")))

    eng_out = ctx["eng_out"]
    eng_fills = json.load(open(os.path.join(eng_out,
                                            "fill_missing_log.json")))
    eng_clean = read_tsv_str(os.path.join(eng_out, "cleaned_contacts.tsv"))
    eng_val = json.load(open(os.path.join(eng_out,
                                          "validation_errors.json")))

    # 1) fills: identical (row, field, value) sets — X_EMAIL2 := EMAIL
    # collapses the #9 key split, the fixture kills the ordering classes
    rf = {(int(e["row"]), e["field"], str(e["new_value"]))
          for e in ref_fills}
    ef = {(int(e["row"]), e["field"] if e["field"] != "EMAIL"
           else "X_EMAIL2", str(e["new_value"])) for e in eng_fills}
    if rf != ef:
        failures.append(f"pipeline lane: fill logs differ: ref={rf} "
                        f"eng={ef}")
    print(f"[parity] pipeline lane: fills ref={sorted(rf)} "
          f"{'==' if rf == ef else '!='} eng={sorted(ef)}")

    # 2) cleaned artifact: same golden rows, every shared cell equal
    # (numeric-parse formatting tolerated via num_equal)
    ref_clean.columns = [c.upper() for c in ref_clean.columns]
    ok_rows = len(ref_clean) == len(eng_clean)
    if not ok_rows:
        failures.append(
            f"pipeline lane: cleaned row counts differ "
            f"({len(ref_clean)} vs {len(eng_clean)})")
    shared = [c for c in ref_clean.columns if c in eng_clean.columns]

    def clean_key(df):
        return df["FULLNAME"].str.lower() + "|" + df["MOBILE"].map(digits)
    refc = ref_clean.set_index(clean_key(ref_clean))
    engc = eng_clean.set_index(clean_key(eng_clean))
    if sorted(refc.index) != sorted(engc.index):
        failures.append(
            f"pipeline lane: golden key sets differ: "
            f"{sorted(refc.index)} vs {sorted(engc.index)}")
    else:
        ncell, nmob = 0, 0
        for k in refc.index:
            for c in shared:
                rv, ev = str(refc.loc[k][c]), str(engc.loc[k][c])
                if rv == ev or num_equal(rv, ev) or ts_equal(rv, ev):
                    ncell += 1
                elif c == "MOBILE" and digits(rv) == ev:
                    # divergence #7: the reference's "contains PHONE"
                    # convention skips cleaning the MOBILE column; the
                    # engine cleans it to digits
                    nmob += 1
                else:
                    failures.append(
                        f"pipeline lane: cleaned cell differs at "
                        f"({k}, {c}): {rv!r} vs {ev!r}")
        print(f"[parity] pipeline lane: cleaned artifact — "
              f"{len(refc)} golden rows x {len(shared)} cols, "
              f"{ncell} cells equal, {nmob} divergence_7 (MOBILE)")

    # 3) validation artifact: identical (name, errors) multisets
    rv = sorted((e["name"], tuple(e["errors"])) for e in ref_val)
    ev = sorted((e["name"], tuple(e["errors"])) for e in eng_val)
    if rv != ev:
        failures.append(
            f"pipeline lane: validation reports differ: {rv} vs {ev}")
    print(f"[parity] pipeline lane: validation — ref {len(rv)} error "
          f"rows {'==' if rv == ev else '!='} eng {len(ev)}")
    if not rv:
        failures.append("pipeline lane: zero validation errors — the "
                        "fixture is not exercising validate")


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

    # ---- prepare EVERY lane's sandbox, then one engine batch (one JVM) --
    eng_prefix = os.path.join(sandbox, "engine")
    fill_nat_job, fill_nat_prefix = fill_prepare(fixture)
    aligned = fixture.copy()
    aligned["X_EMAIL2"] = aligned["EMAIL"]
    fill_ali_job, fill_ali_prefix = fill_prepare(aligned)
    mc_nat_job, mc_nat_ctx = mailchimp_prepare(
        fixture, os.path.join(REF, "data_sources", "mailchimpclean.tsv"))
    aligned_m, aligned_mc = mailchimp_aligned(fixture)
    mc_ali_job, mc_ali_ctx = mailchimp_prepare(aligned_m, aligned_mc)
    run_job, run_ctx = pipeline_prepare()
    run_engine_batch([("dump", fixture_path, eng_prefix),
                      fill_nat_job, fill_ali_job,
                      mc_nat_job, mc_ali_job, run_job])

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

    # the ENGINE stages already ran on the same fixture (batch above)
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

    # ---- stage 3: the fill stage against the reference's own runs ----
    # (both the in-memory and the SQLite-staged reference variants)
    # natural: the reference's own key surface (measures the #9 no-op)
    fill_lane(fixture, failures, "natural", fill_nat_prefix)
    # aligned-email: plant X_EMAIL2 := EMAIL so BOTH sides match on the
    # same email keys — the variant that actually exercises the J2
    # match + first-match-wins fill mechanics on the common surface
    fill_lane(aligned, failures, "aligned-email", fill_ali_prefix)

    # ---- stage 4: the J1 mailchimp merge against the reference's own run --
    # natural: the real mailchimpclean.tsv (measures divergence #10's
    # degenerate mobile key: get_mobile finds no 'mobile'/'number' column)
    mailchimp_lane(fixture, mc_nat_ctx, failures, "natural")
    # aligned: headers both sides resolve + donated contacts, so the
    # (name, phone) -> email and (name, email) -> mobile matches FIRE
    mailchimp_lane(aligned_m, mc_ali_ctx, failures, "aligned")

    # ---- stage 5: run.py ordering — the whole pipeline, same sequence --
    pipeline_lane(failures, run_ctx)

    if failures:
        for f in failures:
            print("[parity] FAIL:", f)
        sys.exit(1)
    print("[parity] green — every difference is a documented divergence")


if __name__ == "__main__":
    main()
