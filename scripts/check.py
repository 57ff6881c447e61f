#!/usr/bin/env python3
"""Local differential harness (SURVEY.md §5): compare Verify.scala's
parquet dumps against DuckDB running oracle_sql.json on the same
scale-factor tables — the same comparison the driver performs, run
early to catch dialect drift.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, math, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def norm_type(t):
    t = str(t)
    if t.startswith("timestamp"):
        return "timestamp"  # ns vs us storage is a read artifact
    if t == "large_string":
        return "string"
    return t


def fetch_sorted_cols(con, sql):
    cur = con.execute(sql)
    arrow_schema = cur.fetch_arrow_table().schema
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    types = [norm_type(arrow_schema.field(c).type) for c in cols]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return ([cols[i] for i in order], [types[i] for i in order],
            [tuple(norm(r[i]) for i in order) for r in rows])


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_noracle = 0
    for name in names:
        got_cols, got_types, got = fetch_sorted_cols(
            con, f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        if name not in oracle:
            print(f"  [no-oracle] {name}: {len(got)} rows")
            n_noracle += 1
            continue
        try:
            exp_cols, exp_types, exp = fetch_sorted_cols(con, oracle[name])
        except Exception as e:
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"  [FAIL] {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
        elif got_types != exp_types:
            diffs = [f"{c}: {g}!={e}" for c, g, e
                     in zip(got_cols, got_types, exp_types) if g != e]
            print(f"  [FAIL] {name}: dtype mismatch {diffs}")
            n_fail += 1
        elif got != exp:
            print(f"  [FAIL] {name}: {len(got)} vs {len(exp)} rows; "
                  f"first diff: ", end="")
            for i, (g, e) in enumerate(zip(got, exp)):
                if g != e:
                    print(f"row {i}: got={g} exp={e}")
                    break
            else:
                print("row-count mismatch "
                      f"(extra={got[len(exp):3+len(exp)] if len(got)>len(exp) else exp[len(got):3+len(got)]})")
            n_fail += 1
        else:
            print(f"  [pass] {name}: {len(got)} rows")
            n_pass += 1
    # declared-but-missing dumps (query threw in Verify)
    for name in sorted(set(oracle) - set(names)):
        print(f"  [FAIL] {name}: declared in oracleSql but no dump (query threw?)")
        n_fail += 1
    print(f"== {n_pass} pass, {n_fail} FAIL, {n_noracle} no-oracle ==")
    return 1 if n_fail else 0


# scalar fields of the bench JSON line — everything that is NOT a
# per-query timing (the load-evidence fields ride in the line's tail
# so they survive the driver's front-truncation)
_NON_QUERY_KEYS = ("value", "sf", "rep2_total", "error_count",
                   "load_start", "probe_start", "load_end", "probe_end")


def _bench_errors(path):
    """Names of queries Bench reported as FAILED (the "errors" list,
    present since r12; failed queries also carry NEGATIVE timings).
    Older artifacts without the key -> empty set."""
    import re
    with open(path) as f:
        rec = json.load(f)
    parsed = rec.get("parsed")
    if isinstance(parsed, dict):
        return set(parsed.get("errors") or [])
    m = re.search(r'"errors":\[([^\]]*)\]', rec.get("tail") or "")
    if not m:
        return set()
    return set(re.findall(r'"([a-z0-9_]+)"', m.group(1)))


def _bench_env(path):
    """Load-evidence fields from a BENCH_r*.json (loadavg + fixed
    micro-probe seconds at start/end), from the parsed dict or the
    stdout tail. Missing fields (pre-r8 rounds) -> absent keys."""
    import re
    with open(path) as f:
        rec = json.load(f)
    parsed = rec.get("parsed")
    src = json.dumps(parsed) if isinstance(parsed, dict) else (rec.get("tail") or "")
    out = {}
    for k in ("load_start", "probe_start", "load_end", "probe_end"):
        m = re.search(rf'"{k}":\s*([0-9]+\.[0-9]+)', src)
        if m:
            out[k] = float(m.group(1))
    return out


def _bench_probes(path):
    """Interleaved per-segment probe data (since r15): Bench runs one
    micro-probe shot after every `seg` queries in each pass and emits
    `"seg":N,"probes1":[...],"probes2":[...]` — probes1 covers the
    cold rep1 pass, probes2 the warm pass2 pass, segment i covering
    sorted-name queries [i*seg, (i+1)*seg). Lets load be adjudicated
    per query FAMILY instead of per run (r14's driver artifact had
    the events family ~2x inflated while the run-level probes could
    only condemn the whole run). Returns (seg, probes1, probes2) or
    (None, [], []) for pre-r15 artifacts."""
    import re
    with open(path) as f:
        rec = json.load(f)
    parsed = rec.get("parsed")
    if isinstance(parsed, dict):
        # The normal r15+ case: the driver kept the parsed dict — read
        # the fields directly. (The old path re-serialized with
        # json.dumps, whose ", "-separated output never matched the
        # no-space regex below, so seg_ratio was silently inert.)
        seg = parsed.get("seg")
        if not seg:
            return (None, [], [])
        return (int(seg),
                [float(x) for x in (parsed.get("probes1") or [])],
                [float(x) for x in (parsed.get("probes2") or [])])
    # Tail fallback (parse failed but the fields survived truncation):
    # Bench emits compact JSON, so no whitespace after ':' or ','.
    src = rec.get("tail") or ""
    m = re.search(r'"seg":\s*(\d+)', src)
    if not m:
        return (None, [], [])
    seg = int(m.group(1))
    out = []
    for k in ("probes1", "probes2"):
        mm = re.search(rf'"{k}":\s*\[([0-9., ]*)\]', src)
        out.append([float(x) for x in mm.group(1).split(",")]
                   if mm and mm.group(1).strip() else [])
    return (seg, out[0], out[1])


def _bench_full(path):
    """Untruncated sidecar for a driver BENCH_r*.json artifact: Bench
    mirrors its full stdout line to BENCH_FULL.json (and the round
    loop snapshots it as BENCH_FULL_r{N}.json) because the driver
    keeps only the line's last ~2000 chars — the r12 round diff could
    compare just 64/157 queries. A sidecar is trusted only when its
    rep2_total AND value match the scalar fields that survived in the
    artifact's tail (they ride at the line's very end), so a sidecar
    from a different run can never be mis-attributed. Returns the
    parsed full dict or None."""
    import re
    with open(path) as f:
        rec = json.load(f)
    src = rec.get("tail") or json.dumps(rec.get("parsed") or {})
    anchors = {}
    for k in ("rep2_total", "value"):
        m = re.search(rf'"{k}":\s*(-?[0-9]+\.[0-9]+)', src)
        if m:
            anchors[k] = float(m.group(1))
    if len(anchors) < 2:
        return None
    d, base = os.path.dirname(path) or ".", os.path.basename(path)
    rnum = re.search(r"r(\d+)", base).group(1)
    for cand in (os.path.join(d, f"BENCH_FULL_r{rnum}.json"),
                 os.path.join(d, "BENCH_FULL.json")):
        if not os.path.exists(cand):
            continue
        try:
            with open(cand) as f:
                full = json.load(f)
        except Exception:
            continue
        if all(abs(float(full.get(k, 1e18)) - v) < 5e-4
               for k, v in anchors.items()):
            return full
    return None


def _bench_queries(path):
    """(rep1, pass2, rep2) per-query second dicts from a driver
    BENCH_r*.json: the validated BENCH_FULL sidecar when one matches,
    else the parsed dict if the driver kept one, else re-extracted
    from the stdout tail (the driver truncates long lines — the
    tail's front is cut, but the pass2/rep2 splits survive as the
    '"pass2":' / '"rep2":' markers). pass2 (the full warm second
    pass, serialized since r13) is empty for older artifacts."""
    import re
    full = _bench_full(path)
    if full is not None:
        return (full.get("queries") or {}, full.get("pass2") or {},
                full.get("rep2") or {})
    with open(path) as f:
        rec = json.load(f)
    parsed = rec.get("parsed")
    if isinstance(parsed, dict):
        return (parsed.get("queries") or {}, parsed.get("pass2") or {},
                parsed.get("rep2") or {})

    def grab(frag, truncated_front=False):
        ms = list(re.finditer(r'"([a-z0-9_]+)":(-?[0-9]+\.[0-9]+)', frag))
        if truncated_front and ms:
            # the tail's front is clipped mid-line: the first match's
            # key may be a garbage suffix (e.g. 'er_complex' from
            # 'filter_complex') — discard it rather than mis-keying
            ms = ms[1:]
        return {m.group(1): float(m.group(2)) for m in ms
                if m.group(1) not in _NON_QUERY_KEYS}
    tail = rec.get("tail") or ""
    head, _, rest = tail.partition('"rep2":')
    head, p2mark, after_p2 = head.partition('"pass2":{')
    pass2 = grab(after_p2) if p2mark else {}
    # anchor at the queries map when the marker survived truncation;
    # otherwise the head's first match is possibly clipped — and its
    # ATTRIBUTION depends on the line vintage. r13 lines carried
    # queries→pass2→rep2 back to back (~7.5 kB), so a 2000-char tail
    # starts MID-PASS2 with both markers clipped away: those entries
    # are warm pass2 timings, and keying them as rep1 (cold) would
    # feed them through probe normalization as false speedups — the
    # exact failure class the pass2 serialization was built to kill.
    # Pre-r13 lines had no pass2 map, so their clipped head really is
    # rep1. r14+ lines are short (maps live in the sidecar) and parse
    # whole, so this fallback shouldn't trigger for them at all.
    _, qmark, after_q = head.partition('"queries":{')
    if qmark:
        return (grab(after_q), pass2, grab(rest))
    m = re.search(r"r(\d+)", os.path.basename(path))
    rnum = int(m.group(1)) if m else 0
    entries = grab(head, truncated_front=True)
    if rnum >= 13 and not p2mark:
        return ({}, {**entries, **pass2}, grab(rest))
    return (entries, pass2, grab(rest))


def bench_history(repo_dir="."):
    """Compare the two newest BENCH_r*.json per-query: flag >2x
    regressions (driver artifact of the judge's manual round diff).
    Preference per query: pass2 (full warm second pass, in the
    artifact since r13 — the load-independent number a regression
    diff should use), then rep2 (top-10 warm re-times), then rep1
    (cold, probe-normalized — distorted by cache-build attribution
    and JIT order: 8 false flags in r12 came from rep1-only data).
    Pairs under 1 s are JVM-floor noise and never flagged. Returns
    the flag count."""
    import glob
    import re as _re
    paths = sorted(
        glob.glob(os.path.join(repo_dir, "BENCH_r*.json")),
        key=lambda p: int(_re.search(r"r(\d+)", os.path.basename(p)).group(1)))
    if len(paths) < 2:
        print("bench-history: fewer than two BENCH rounds, nothing to diff")
        return 0
    prev_p, cur_p = paths[-2], paths[-1]
    prev1, prev_pass2, prev2 = _bench_queries(prev_p)
    cur1, cur_pass2, cur2 = _bench_queries(cur_p)
    # Ambient-load normalization: the fixed micro-probe runs identical
    # work every round, so probe_cur/probe_prev measures the HOST
    # difference between the two runs (BENCH_r07 read as a 69%
    # regression that was entirely host load). When the current run
    # was measurably more loaded, rep1 comparisons are normalized by
    # the ratio; rep2 (the warm floor) is left as measured.
    prev_env, cur_env = _bench_env(prev_p), _bench_env(cur_p)
    # Per-SEGMENT normalization (r15+): when both rounds carry the
    # interleaved probe arrays, a query's rep1/pass2 comparison is
    # normalized by the probe ratio of ITS segment, so driver-box
    # load localizes to the query family it actually hit instead of
    # smearing one global factor over 157 queries. Segment index =
    # position of the query in that run's sorted name list // seg.
    prev_seg, prev_pr1, prev_pr2 = _bench_probes(prev_p)
    cur_seg, cur_pr1, cur_pr2 = _bench_probes(cur_p)

    def seg_index(name, names_sorted, seg):
        try:
            return min(names_sorted.index(name) // seg,  # last partial
                       max(0, (len(names_sorted) - 1) // seg))
        except ValueError:
            return None

    def seg_ratio(name, kind):
        """cur/prev probe ratio for the segment `name` fell in, or
        None when either side lacks segment probes for that pass.
        rep1 uses probes1 (cold pass), pass2 uses probes2. rep2 is
        NEVER normalized: Bench runs the rep2 re-times BETWEEN rep1
        and pass2, before any probes2 shot is taken, so a pass2-era
        load spike would wrongly deflate rep2 comparisons that ran
        under different load (r15 advice)."""
        if kind == "rep2" or not (prev_seg and cur_seg):
            return None
        prev_pr = prev_pr1 if kind == "rep1" else prev_pr2
        cur_pr = cur_pr1 if kind == "rep1" else cur_pr2
        prev_names = sorted(prev_pass2 or prev1)
        cur_names = sorted(cur_pass2 or cur1)
        i = seg_index(name, prev_names, prev_seg)
        j = seg_index(name, cur_names, cur_seg)
        if i is None or j is None or i >= len(prev_pr) or j >= len(cur_pr):
            return None
        if prev_pr[i] <= 0 or cur_pr[j] <= 0:
            return None
        return cur_pr[j] / prev_pr[i]

    probe_ratio = 1.0
    if prev_env.get("probe_start") and cur_env.get("probe_start"):
        raw_ratio = cur_env["probe_start"] / prev_env["probe_start"]
        probe_ratio = max(1.0, raw_ratio)
        # ALWAYS print the factor (round-8 advice): the next judge
        # must see the correction applied even when it is ~1.0, so a
        # quiet round is distinguishable from a pre-probe round.
        print(f"  [probe-norm] micro-probe ratio {raw_ratio:.2f}x vs "
              f"{os.path.basename(prev_p)} (loadavg "
              f"{cur_env.get('load_start', -1):.1f} -> "
              f"{cur_env.get('load_end', -1):.1f}); rep1 divided by "
              f"{probe_ratio:.2f}" +
              ("; LOADED RUN — trust rep2" if probe_ratio > 1.5 else ""))
    else:
        print("  [probe-norm] no probe fields on one side "
              "(pre-r8 round?); rep1 compared raw")
    # A query Bench marked FAILED (errors list / negative timing) is
    # an AnalysisException cost, not a measurement — comparing against
    # it would flag every post-fix round as a "regression" (the
    # r10/r11 events breakage recorded 59 ~0.07 s fakes).
    failed = _bench_errors(prev_p) | _bench_errors(cur_p)
    if failed:
        print(f"  [failed-skip] {len(failed)} queries failed in one of "
              "the rounds; excluded from the diff: "
              + ", ".join(sorted(failed)[:8])
              + ("..." if len(failed) > 8 else ""))
    flags = compared = 0
    kinds = {}
    for name in sorted(set(prev1) | set(prev_pass2) | set(prev2)):
        if name in failed:
            continue
        if name in prev_pass2 and name in cur_pass2:
            p, c, kind = prev_pass2[name], cur_pass2[name], "pass2"
        elif name in prev2 and name in cur2:
            p, c, kind = prev2[name], cur2[name], "rep2"
        elif name in prev1 and name in cur1:
            p, c, kind = prev1[name], cur1[name] / probe_ratio, "rep1"
        else:
            continue
        if p < 0 or c < 0:  # negative = failed-query marker
            continue
        sr = seg_ratio(name, kind)
        if sr is not None and kind == "rep1":
            # undo the global factor, apply the segment's own
            c = (cur1[name] if name in cur1 else c * probe_ratio)
            c /= max(1.0, sr)
        elif sr is not None and sr > 1.0:
            # warm passes were previously compared raw; a loaded
            # SEGMENT (not just a loaded run) now normalizes them too
            c /= sr
        kinds[kind] = kinds.get(kind, 0) + 1
        compared += 1
        if c > 2.0 * p and c >= 1.0:
            note = (f", seg-probe ratio {sr:.2f}x" if sr is not None
                    else "")
            print(f"  [REGRESSION] {name} ({kind}): {p:.2f}s -> {c:.2f}s"
                  f" ({os.path.basename(prev_p)} -> "
                  f"{os.path.basename(cur_p)}{note})")
            flags += 1
    by_kind = ", ".join(f"{v} via {k}" for k, v in sorted(kinds.items()))
    print(f"== bench-history: {compared} queries compared"
          f" ({by_kind}), {flags} flagged ==")
    return flags


def sweep(testdata_root="/root/testdata", sfs=("0.001", "0.01", "0.1")):
    """The un-skippable 3-SF oracle gate: run Verify + the DuckDB
    compare at every scale factor in one command. Every cross-engine
    hazard so far (geo_headings bearing ties, window_pct .5 ties,
    events_anomaly_mad HALF_UP tie, the agg_higher_moments -0.0 skew)
    surfaced at a NON-graded SF first — the driver grades only
    sf0.01, so a single-SF check is a false green. Returns nonzero
    if any SF had a failure."""
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    summaries = []
    total_fails = 0
    for sf in sfs:
        sf_dir = os.path.join(testdata_root, f"sf{sf}")
        out = f"/tmp/graft_sweep_sf{sf}"
        print(f"=== sweep sf{sf}: Verify -> {out} ===", flush=True)
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out}"],
            cwd=repo, capture_output=True, text=True)
        if r.returncode != 0:
            lines = (r.stdout + r.stderr).strip().splitlines()
            print("  Verify FAILED; last output:")
            for l in lines[-15:]:
                print("   ", l)
            summaries.append(f"sf{sf}: VERIFY ERROR")
            total_fails += 1
            continue
        failed_marker = os.path.join(out, "_failed.json")
        if os.path.exists(failed_marker):
            with open(failed_marker) as f:
                broken = json.load(f)
            if broken:
                print(f"  _failed.json: {len(broken)} queries threw: "
                      + ", ".join(sorted(broken)[:8]))
        rc = main(sf_dir, out)
        total_fails += rc
        summaries.append(f"sf{sf}: {'OK' if rc == 0 else 'FAIL'}")
    print("== sweep:", "; ".join(summaries), "==")
    return total_fails


def snapshot_bench(repo_dir="."):
    """Start-of-round step: the driver's end-of-round Bench run leaves
    its untruncated line in BENCH_FULL.json, which the NEXT local
    bench run would overwrite. If it matches the newest BENCH_r*.json
    artifact (the same rep2_total/value anchors _bench_full checks),
    persist it as BENCH_FULL_r{N}.json so warm pass2 data survives
    per round. Idempotent; returns 0 on snapshot-or-already, 1 when
    no validated sidecar exists."""
    import glob
    import re
    paths = sorted(
        glob.glob(os.path.join(repo_dir, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)))
    if not paths:
        print("snapshot-bench: no driver BENCH artifacts")
        return 0
    newest = paths[-1]
    rnum = re.search(r"r(\d+)", os.path.basename(newest)).group(1)
    dst = os.path.join(repo_dir, f"BENCH_FULL_r{rnum}.json")
    # _bench_full prefers the per-round snapshot and validates its
    # rep2_total/value anchors against the artifact tail, so this is
    # the GATE form: absent-or-mismatching snapshot with no recovery
    # source returns nonzero, and an existing-but-stale snapshot is
    # rewritten from the source that does validate rather than
    # silently trusted.
    full = _bench_full(newest)
    if full is None:
        print("snapshot-bench: GATE FAIL — no sidecar validates "
              f"against {os.path.basename(newest)} (pre-r13 round, or "
              "the sidecar was overwritten before snapshotting)")
        return 1
    if os.path.exists(dst):
        try:
            with open(dst) as f:
                cur = json.load(f)
        except Exception:
            cur = None
        if cur == full:
            print(f"snapshot-bench: {os.path.basename(dst)} already "
                  "exists and validates against the artifact anchors")
            # Still run the quiet-gate: without this, a first run that
            # wrote dst but FAILED the quiet gate (exit 1) would make
            # every re-run return 0 here and permanently bypass the
            # r15+ quiet requirement for the round (r15 advice).
            return _snapshot_quiet(repo_dir, rnum)
        print(f"snapshot-bench: {os.path.basename(dst)} exists but "
              "does NOT match the validating source — rewriting")
    with open(dst, "w") as f:
        json.dump(full, f)
    print(f"snapshot-bench: wrote {os.path.basename(dst)} "
          f"({len(full.get('pass2') or {})} warm pass2 entries)")
    return _snapshot_quiet(repo_dir, rnum)


def _quiet_sidecar_ok(data):
    """Validate a quiet sidecar as a candidate FULL-SUITE round record.
    Returns (ok, reason). r18 advice: Bench stamps any
    SPARK_GRAFT_BENCH_EXCLUDE set into the sidecar as "excluded", but
    nothing here read it — a partial run with an artificially low
    rep2_total could pass the full-suite quiet gate. A non-empty
    excluded array now disqualifies the sidecar as the round's quiet
    record (such runs are off-fixture scale artifacts, committed under
    their own names like BENCH_SUITE100X_r18.json, never as
    BENCH_FULL_r{N}_quiet.json)."""
    if not data.get("pass2"):
        return False, "no pass2 map"
    if data.get("rep2_total") is None:
        return False, "no rep2_total"
    if data.get("excluded"):
        return False, (f"stamped excluded={data['excluded']} — a partial "
                       "run cannot stand as the round's full-suite quiet "
                       "record")
    return True, None


def _snapshot_quiet(repo_dir, rnum):
    """Persist the round's QUIET-BOX sidecar as
    BENCH_FULL_r{N}_quiet.json. The driver's end-of-round run shares
    the box with the driver itself, so the committed per-round
    sidecar alone preserves a load-inflated run (r13: rep2_total
    98.46 driver vs 52.4 quiet, and the quiet map survived only as
    BASELINE.md trend aggregates). In-round quiet runs write their
    sidecar to BENCH_FULL_QUIET.json (SPARK_GRAFT_BENCH_FULL env
    override); this snapshots it per round. GATE (r15+): absent
    quiet snapshot with no source fails the round.

    Staleness (r15 advice): the live sidecar is CONSUMED (deleted)
    once snapshotted, so a leftover quiet run from round N can never
    silently satisfy round N+1's gate and be persisted under the
    wrong round number — each round's gate demands a fresh in-round
    quiet run.

    Round anchoring (r17 advice, upgraded r18): Bench stamps the
    round number into the sidecar when the quiet run exports
    SPARK_GRAFT_ROUND, and a stamped sidecar is adjudicated by that
    RECORDED round, never by mtime — mtime cannot distinguish a
    round-N re-run landing after the snapshot from an early round-N+1
    run (r17 advice: the re-run would have survived and silently
    satisfied round N+1's gate). recorded < rnum → stale leftover,
    consumed; == rnum → this round's run (snapshot source, or
    consumed when a valid snapshot already stands); > rnum → left for
    the NEXT round's snapshot. Unstamped sidecars (pre-r18 Bench, or
    a run without the env) fall back to the r16 mtime rule: older
    than a valid snapshot is consumed, newer is left in place."""
    src = os.path.join(repo_dir, "BENCH_FULL_QUIET.json")
    dst = os.path.join(repo_dir, f"BENCH_FULL_r{rnum}_quiet.json")

    def src_round():
        try:
            with open(src) as f:
                r = json.load(f).get("round")
            return int(r) if r is not None else None
        except Exception:
            return None

    if os.path.exists(src):
        sr = src_round()
        if sr is not None and sr < int(rnum):
            os.remove(src)
            print(f"snapshot-bench: consumed stale {os.path.basename(src)} "
                  f"(stamped round {sr} < r{rnum})")
        elif sr is not None and sr > int(rnum):
            print(f"snapshot-bench: live sidecar is stamped round {sr} "
                  f"> r{rnum}; left in place for that round's snapshot")
            if os.path.exists(dst):
                # fall through to validate the existing snapshot only
                pass
            else:
                print("snapshot-bench: GATE FAIL — no quiet sidecar FOR "
                      f"r{rnum} (the live one belongs to round {sr})")
                return 1
    if os.path.exists(dst):
        try:
            with open(dst) as f:
                cur = json.load(f)
            dst_ok, why = _quiet_sidecar_ok(cur)
            if not dst_ok:
                print(f"snapshot-bench: existing {os.path.basename(dst)} "
                      f"rejected as the round record ({why})")
        except Exception as e:
            print(f"snapshot-bench: existing {os.path.basename(dst)} "
                  f"unreadable ({e}) — will refresh from the live "
                  "sidecar if one exists")
            dst_ok = False
        if os.path.exists(src):
            if dst_ok:
                # Valid committed snapshot wins. A sidecar stamped for
                # THIS round is a same-round re-run: consume it so it
                # can never satisfy round N+1's gate under the wrong
                # round; one stamped for a LATER round stays. Unstamped
                # sidecars fall back to the r16 mtime rule.
                sr = src_round()
                if sr is not None and sr == int(rnum):
                    os.remove(src)
                    print("snapshot-bench: consumed same-round re-run "
                          f"{os.path.basename(src)} (stamped r{sr}; the "
                          f"committed r{rnum} snapshot stands)")
                elif sr is not None:
                    print(f"snapshot-bench: live sidecar stamped r{sr} "
                          "left in place for that round's snapshot")
                elif os.path.getmtime(src) <= os.path.getmtime(dst):
                    os.remove(src)
                    print("snapshot-bench: consumed stale "
                          f"{os.path.basename(src)} (unstamped, older "
                          f"than the committed r{rnum} snapshot, which "
                          "stands)")
                else:
                    print(f"snapshot-bench: {os.path.basename(dst)} "
                          "already valid; newer UNSTAMPED live sidecar "
                          "left in place for the NEXT round's snapshot")
                return _trend_anchor_check(repo_dir, rnum, warn_only=True)
            sr = src_round()
            if sr is not None and sr != int(rnum):
                print("snapshot-bench: GATE FAIL — existing "
                      f"{os.path.basename(dst)} is invalid and the live "
                      f"sidecar is stamped r{sr}, not r{rnum}; cannot "
                      "refresh from a different round's run")
                return 1
            try:
                with open(src) as f:
                    quiet = json.load(f)
                ok, why = _quiet_sidecar_ok(quiet)
                assert ok, why
            except Exception as e:
                print("snapshot-bench: GATE FAIL — quiet sidecar "
                      f"unusable: {e}")
                return 1
            with open(dst, "w") as f:
                json.dump(quiet, f)
            os.remove(src)
            print(f"snapshot-bench: {os.path.basename(dst)} was invalid "
                  "— refreshed from the live quiet sidecar "
                  f"(rep2_total {quiet.get('rep2_total')}); consumed "
                  f"{os.path.basename(src)}")
            return _trend_anchor_check(repo_dir, rnum, warn_only=True)
        if dst_ok:
            print(f"snapshot-bench: {os.path.basename(dst)} already exists")
            return 0
        print("snapshot-bench: GATE FAIL — existing "
              f"{os.path.basename(dst)} is invalid and no live quiet "
              "sidecar exists to refresh it")
        return 1
    if not os.path.exists(src):
        if int(rnum) >= 15:
            print("snapshot-bench: GATE FAIL — no quiet-box sidecar "
                  f"(run Bench on a quiet box with SPARK_GRAFT_BENCH_FULL="
                  f"{src} before snapshotting)")
            return 1
        print(f"snapshot-bench: no quiet sidecar for r{rnum} "
              "(pre-r15 round; quiet runs were not mirrored)")
        return 0
    try:
        with open(src) as f:
            quiet = json.load(f)
        ok, why = _quiet_sidecar_ok(quiet)
        assert ok, why
    except Exception as e:
        print(f"snapshot-bench: GATE FAIL — quiet sidecar unusable: {e}")
        return 1
    with open(dst, "w") as f:
        json.dump(quiet, f)
    os.remove(src)
    print(f"snapshot-bench: wrote {os.path.basename(dst)} "
          f"(quiet rep2_total {quiet.get('rep2_total')}); consumed "
          f"{os.path.basename(src)}")
    return _trend_anchor_check(repo_dir, rnum, warn_only=True)


def _trend_anchor_check(repo_dir, rnum, warn_only=False):
    """Audit-trail guard (r17 verdict finding 1): the committed
    BENCH_FULL_r{N}_quiet.json and BASELINE.md's r{N} trend row must
    cite the SAME run — r17's end-of-round snapshot overwrote the
    gate-cited 46.72 s sidecar with a later 51.8 s run, leaving the
    trend row's "IS the committed sidecar" claim stale against the
    file it cites. The check is mechanical: the snapshot's
    rep2_total, formatted to 2 or 3 decimals, must appear in
    BASELINE.md. warn_only=True (the snapshot path — the trend row is
    often written AFTER the snapshot) prints a loud warning and
    returns 0; the strict form is the `--quiet-anchors N` end-of-round
    gate and returns 1 on mismatch."""
    dst = os.path.join(repo_dir, f"BENCH_FULL_r{rnum}_quiet.json")
    baseline = os.path.join(repo_dir, "BASELINE.md")
    if not os.path.exists(dst):
        # In-round form: the per-round snapshot is written at the NEXT
        # round's start, so before then the live sidecar is the round's
        # record — accept it only when its stamp matches rnum.
        live = os.path.join(repo_dir, "BENCH_FULL_QUIET.json")
        try:
            with open(live) as f:
                if int(json.load(f).get("round")) == int(rnum):
                    dst = live
        except Exception:
            pass
    if not (os.path.exists(dst) and os.path.exists(baseline)):
        if not warn_only:
            print(f"quiet-anchors: GATE FAIL — missing "
                  f"{os.path.basename(dst)} or BASELINE.md")
            return 1
        return 0
    with open(dst) as f:
        snap = json.load(f)
    rep2 = snap.get("rep2_total")
    ok, why = _quiet_sidecar_ok(snap)
    if not ok:
        msg = (f"r{rnum} quiet record {os.path.basename(dst)} is not a "
               f"valid full-suite sidecar: {why}")
        if warn_only:
            print(f"snapshot-bench: WARNING — {msg}")
            return 0
        print(f"quiet-anchors: GATE FAIL — {msg}")
        return 1
    with open(baseline) as f:
        text = f.read()
    # Word-boundary match at 2-3 decimals only (r18 advice): the old
    # plain-substring + .1f fallback made coincidental hits ("46.7"
    # inside "146.72") possible; the docstring's contract is 2-3
    # decimals, so that is what is accepted.
    import re as _re
    hits = [fmt for fmt in (f"{rep2:.3f}", f"{rep2:.2f}")
            if _re.search(r"(?<![\d.])" + _re.escape(fmt) + r"(?![\d])",
                          text)]
    if hits:
        print(f"quiet-anchors: r{rnum} trend row cites the committed "
              f"sidecar (rep2_total {rep2} found as '{hits[0]}')")
        return 0
    msg = (f"r{rnum} snapshot rep2_total {rep2} does NOT appear in "
           "BASELINE.md — the trend row cites a different run than "
           "the committed sidecar")
    if warn_only:
        print(f"snapshot-bench: WARNING — {msg} (write/fix the trend "
              "row, then run --quiet-anchors "
              f"{rnum} as the end-of-round gate)")
        return 0
    print(f"quiet-anchors: GATE FAIL — {msg}")
    return 1


def determinism(dir_a, dir_b):
    """Diff two Verify dumps of the same suite (SURVEY §5's
    determinism test at bench scale): every query's dump must contain
    the same rows IN THE SAME ORDER across runs. Catches order
    instability that the single-run oracle compare cannot (a
    non-total ORDER BY can pass the sorted-rows compare yet flip rows
    between runs under real shuffle parallelism).

    NOT a raw byte-diff: parquet-mr serializes each column chunk's
    `encodings` SET in enum-identity-hash order, which varies per JVM
    run — measured r13: every file's footer bytes permute the
    encoding list ([0,4,3] vs [3,4,0]) while lengths and all data
    pages match. So the compare is order-preserving CONTENT equality
    via pyarrow (schema + values + row order). Part filenames embed
    task UUIDs, so files are matched per query dir (each dump is
    coalesced to one part). Returns the mismatch count."""
    import glob as g
    import pyarrow.parquet as pq
    qa = {d for d in os.listdir(dir_a)
          if os.path.isdir(os.path.join(dir_a, d))}
    qb = {d for d in os.listdir(dir_b)
          if os.path.isdir(os.path.join(dir_b, d))}
    bad = 0
    for name in sorted(qa ^ qb):
        print(f"  [DIFF] {name}: present in only one run")
        bad += 1
    same = 0
    for name in sorted(qa & qb):
        pa = sorted(g.glob(os.path.join(dir_a, name, "part-*.parquet")))
        pb = sorted(g.glob(os.path.join(dir_b, name, "part-*.parquet")))
        if len(pa) != 1 or len(pb) != 1:
            print(f"  [DIFF] {name}: expected exactly one part file, "
                  f"got {len(pa)} vs {len(pb)}")
            bad += 1
            continue
        ta, tb = pq.read_table(pa[0]), pq.read_table(pb[0])
        if ta.schema != tb.schema:
            print(f"  [DIFF] {name}: schemas differ across runs")
            bad += 1
        elif not ta.equals(tb):  # includes ROW ORDER
            first = next((i for i in range(min(ta.num_rows, tb.num_rows))
                          if ta.slice(i, 1) != tb.slice(i, 1)), None)
            print(f"  [DIFF] {name}: {ta.num_rows} vs {tb.num_rows} "
                  f"rows, first differing row {first} — "
                  "non-deterministic dump (tighten the ORDER BY?)")
            bad += 1
        else:
            same += 1
    print(f"== determinism: {same} order-identical, {bad} differ ==")
    return bad


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--bench-history":
        sys.exit(1 if bench_history(*(sys.argv[2:3] or ["."])) else 0)
    if len(sys.argv) > 1 and sys.argv[1] == "--sweep":
        sys.exit(1 if sweep(*(sys.argv[2:3] or [])) else 0)
    if len(sys.argv) > 1 and sys.argv[1] == "--determinism":
        sys.exit(1 if determinism(sys.argv[2], sys.argv[3]) else 0)
    if len(sys.argv) > 1 and sys.argv[1] == "--snapshot-bench":
        sys.exit(snapshot_bench(*(sys.argv[2:3] or ["."])))
    if len(sys.argv) > 1 and sys.argv[1] == "--quiet-anchors":
        sys.exit(_trend_anchor_check(".", sys.argv[2]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
