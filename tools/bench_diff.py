#!/usr/bin/env python3
"""Compare two graft bench results query-by-query, quiet-record-first.

Usage:
  python3 tools/bench_diff.py <old> <new> [threshold_pct]
  python3 tools/bench_diff.py r14 r15          # round shorthand
  python3 tools/bench_diff.py --noise r15      # driver-vs-quiet audit

An `rN` argument resolves to BENCH_quiet_rN.json when present (the
committed per-round perf RECORD: medians + qmin + spread + raw reps)
and falls back to the driver's BENCH_rN.json — which is a single
unrepeated run on a possibly-loaded box and has misread as a
regression three rounds running (r15: als_rank1 "16.9 s" driver vs
4.0 s quiet the same day). A file argument is used as given: either
artifact shape, or a raw one-line JSON printed by graft.Bench.

Regression logic is qmin-aware where qmin exists: a query is flagged
SLOWER only when BOTH its median and its qmin degrade past the
threshold — a median-only move with a stable qmin is box load, not
code (the round-9/14 interleaved-A/B lesson, applied automatically).
Spread-listed (noisy) queries are annotated inline.

--noise mode reads one round's driver AND quiet artifacts and lists
queries whose driver/quiet ratio exceeds 3x — the artifact-noise
audit the round-15 verdict asked for.
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse(text, path):
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d
    if isinstance(d, dict):  # driver wrapper: parsed result or raw tail
        if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
            return d["parsed"]
        text = d.get("tail", "")
    m = re.search(r'\{"metric".*\}', text)
    if m:
        return json.loads(m.group(0))
    # Crashed-driver salvage (round 16: rc=1, parsed=null, and the
    # wrapper's tail kept only the END of the bench line — the
    # {"metric" prefix was truncated away). Reconstruct from the
    # "queries" object onward so the noise audit works exactly when
    # the driver number is most suspect.
    qm = re.search(r'"queries":\{', text)
    if qm:
        frag = "{" + text[qm.start():].splitlines()[0]
        try:
            d = json.loads(frag)
        except json.JSONDecodeError:
            d = None
        if isinstance(d, dict) and isinstance(d.get("queries"), dict):
            d.setdefault("value", sum(d["queries"].values()))
            print(f"  [warn] {os.path.basename(path)}: bench line "
                  f"front-truncated; salvaged {len(d['queries'])} per-query "
                  "numbers (total reconstructed as their sum)")
            return d
    sys.exit(f"{path}: no bench JSON line found")


def load(arg, prefer_quiet=True):
    m = re.fullmatch(r"r(\d+)", arg)
    if m:
        n = int(m.group(1))
        quiet = os.path.join(REPO, f"BENCH_quiet_r{n:02d}.json")
        if not os.path.exists(quiet):
            quiet = os.path.join(REPO, f"BENCH_quiet_r{n}.json")
        driver = os.path.join(REPO, f"BENCH_r{n:02d}.json")
        if not os.path.exists(driver):
            driver = os.path.join(REPO, f"BENCH_r{n}.json")
        if prefer_quiet and os.path.exists(quiet):
            path = quiet
        elif os.path.exists(driver):
            path = driver
            if prefer_quiet:
                print(f"  [warn] no quiet record for {arg} — falling back to "
                      f"the driver artifact {os.path.basename(path)} (single "
                      f"unrepeated run; treat regressions as suspect)")
        else:
            sys.exit(f"{arg}: neither quiet nor driver artifact found")
        d = parse(open(path).read(), path)
        d["_path"] = os.path.basename(path)
        return d
    d = parse(open(arg).read(), arg)
    d["_path"] = os.path.basename(arg)
    return d


def noise_audit(round_arg):
    quiet = load(round_arg, prefer_quiet=True)
    driver = load(round_arg, prefer_quiet=False)
    if quiet["_path"] == driver["_path"]:
        sys.exit(f"{round_arg}: need BOTH quiet and driver artifacts for "
                 "the noise audit")
    dq, qq = driver["queries"], quiet["queries"]
    print(f"driver {driver['_path']} vs quiet {quiet['_path']}: "
          f"flagging driver/quiet ratio > 3x (artifact noise)")
    flagged = 0
    for name in sorted(set(dq) & set(qq)):
        if qq[name] > 0 and dq[name] / qq[name] > 3:
            flagged += 1
            print(f"  NOISE {name}: driver {dq[name]:.2f}s vs quiet "
                  f"{qq[name]:.2f}s ({dq[name] / qq[name]:.1f}x) — "
                  "do not read the driver number as a regression")
    if not flagged:
        print("  none — driver and quiet agree within 3x everywhere")


def main():
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--noise":
        noise_audit(args[1])
        return
    old, new = load(args[0]), load(args[1])
    thresh = float(args[2]) / 100 if len(args) > 2 else 0.25
    oq, nq = old["queries"], new["queries"]
    oqm, nqm = old.get("qmin") or {}, new.get("qmin") or {}
    print(f"{old['_path']} -> {new['_path']}")
    print(f"total: {old['value']:.2f}s -> {new['value']:.2f}s "
          f"({new['value'] / old['value']:.2f}x), "
          f"{len(oq)} -> {len(nq)} queries")
    if old.get("qmin_total") and new.get("qmin_total"):
        print(f"qmin total: {old['qmin_total']:.2f}s -> "
              f"{new['qmin_total']:.2f}s "
              f"({new['qmin_total'] / old['qmin_total']:.2f}x)")
    # Host-calibration normalization (round 17): each artifact carries a
    # pure-JVM FNV probe timed on its own run. If calib moved with the
    # totals, the delta is the BOX, not the code — say so with numbers
    # instead of leaving two rounds of "+24%? box state again?" to an
    # interleaved-A/B campaign.
    #
    # Round 19: records additionally carry `calib_series` — one
    # single-sample cpu+mem probe pair every ~32 queries. Where the
    # series exists, the effective calib per axis is the MEDIAN over
    # pre + series + end samples (endpoint probes on a box that
    # degrades MID-run misstate the regime the queries actually saw —
    # the r18 adjudication's instrument gap), and the mid-run-change
    # warning reads the series range, not just the endpoints.
    def axis_samples(d, axis):
        pre_k, end_k = (("calib", "calib_end") if axis == "cpu"
                        else ("calib_mem", "calib_mem_end"))
        xs = [d[k] for k in (pre_k, end_k) if d.get(k)]
        xs[1:1] = [p[axis] for p in d.get("calib_series") or [] if p.get(axis)]
        return xs

    def axis_median(d, axis):
        xs = sorted(axis_samples(d, axis))
        return xs[len(xs) // 2] if xs else None

    for side, d in (("old", old), ("new", new)):
        for axis in ("cpu", "mem"):
            xs = axis_samples(d, axis)
            if len(xs) >= 2 and max(xs) / min(xs) > 1.5:
                detail = (" series " + "/".join(f"{x:.2f}" for x in xs)
                          if d.get("calib_series") else
                          f" calib {xs[0]:.2f}s -> {xs[-1]:.2f}s")
                print(f"  [warn] {side} run's host state CHANGED mid-run "
                      f"({axis}{detail}) — treat its medians as mixed-regime")
    oc, nc = axis_median(old, "cpu"), axis_median(new, "cpu")
    if oc and nc:
        raw = new["value"] / old["value"]
        # calib_par absent (pre-r17 record): print n/a, not a fake
        # measured 0.00s parallel probe.
        def par(rec):
            v = rec.get("calib_par")
            return f"{v:.2f}s" if v is not None else "n/a"
        series_note = (" [series-median]" if old.get("calib_series")
                       or new.get("calib_series") else "")
        print(f"host calib (cpu): {oc:.3f}s -> {nc:.3f}s ({nc / oc:.2f}x; "
              f"parallel {par(old)} -> {par(new)}){series_note}")
        om, nm = axis_median(old, "mem"), axis_median(new, "mem")
        if om and nm:
            print(f"host calib (mem): {om:.3f}s -> {nm:.3f}s "
                  f"({nm / om:.2f}x pointer-chase){series_note}")
        # Normalize by the WORSE axis: Spark work is a mix of both, so
        # a total inflation within max(cpu, mem) host movement is box
        # state; beyond it is suspect code.
        host = max(nc / oc, (nm / om) if om and nm else 0)
        print(f"calib-normalized total ratio: {raw / host:.2f}x "
              f"(raw {raw:.2f}x / host {host:.2f}x)")
    # Per-window host annotation (round 19): queries run in sorted
    # order and calib_series samples carry their run index, so each
    # query maps to the host probes nearest its own execution window.
    # When BOTH records carry a series, flagged queries get the
    # window-local host ratio — a query whose window ran 1.6× hot is
    # box, not code, even when the whole-run medians look calm.
    def window_factor(name):
        if not (old.get("calib_series") and new.get("calib_series")):
            return None

        # r19 advice fix: the series' "at" values are indices into each
        # record's OWN full sorted query list, so the query's window
        # index must be computed per record (the old intersection index
        # drifted from both runs' true indices whenever rounds added or
        # removed queries) — and the end probes (calib_end /
        # calib_mem_end) must participate, or late-run queries map to
        # the last interior sample instead of the end of run.
        def probe_at(d, queries, axis):
            if name not in queries:
                return None
            i = sorted(queries).index(name)
            pre_k = "calib" if axis == "cpu" else "calib_mem"
            end_k = "calib_end" if axis == "cpu" else "calib_mem_end"
            pts = [(0, d.get(pre_k))] + \
                [(p["at"], p.get(axis)) for p in d["calib_series"]] + \
                [(len(queries), d.get(end_k))]
            pts = [(at, v) for at, v in pts if v]
            return min(pts, key=lambda p: abs(p[0] - i))[1] if pts else None

        ratios = []
        for axis in ("cpu", "mem"):
            o_p, n_p = probe_at(old, oq, axis), probe_at(new, nq, axis)
            if o_p and n_p:
                ratios.append(n_p / o_p)
        return max(ratios) if ratios else None

    noisy = set(old.get("spread") or []) | set(new.get("spread") or [])
    # Rep-trend flags (round-18): a "rising"/"falling" query's median
    # misstates its steady state (warm-cache inversion / settle-in), so
    # its round-over-round delta is annotated — read qmin, not median.
    trends = {}
    for side, d in (("old", old), ("new", new)):
        for name, t in (d.get("trend") or {}).items():
            trends.setdefault(name, []).append(f"{side} reps {t}")
    for name in sorted(set(nq) - set(oq)):
        print(f"  NEW  {name}: {nq[name]:.3f}s")
    for name in sorted(set(oq) - set(nq)):
        print(f"  GONE {name} (was {oq[name]:.3f}s)")
    deltas = [(nq[n] / oq[n], n) for n in oq if n in nq and oq[n] > 0]
    for ratio, name in sorted(deltas, reverse=True):
        if abs(ratio - 1) < thresh:
            continue
        tags = []
        qrat = None
        if name in oqm and name in nqm and oqm[name] > 0:
            qrat = nqm[name] / oqm[name]
        if ratio > 1:
            # qmin-aware: a median-only move with a stable qmin is box
            # load, not code — say so instead of crying regression.
            if qrat is not None and abs(qrat - 1) < thresh:
                tags.append("qmin stable: likely box noise")
            wf = window_factor(name)
            if wf is not None and wf > 1.2:
                tags.append(f"window host {wf:.2f}x — discount before "
                            "reading as code")
            tag = "SLOWER"
        else:
            tag = "faster"
        if name in noisy:
            tags.append("spread-flagged noisy")
        if name in trends:
            tags.append("; ".join(trends[name]) + " — median misstates steady state, read qmin")
        extra = f" qmin {oqm[name]:.3f}->{nqm[name]:.3f}" \
            if qrat is not None else ""
        suffix = f"  [{'; '.join(tags)}]" if tags else ""
        print(f"  {tag} {name}: {oq[name]:.3f}s -> {nq[name]:.3f}s "
              f"({ratio:.2f}x){extra}{suffix}")


if __name__ == "__main__":
    main()
