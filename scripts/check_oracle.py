#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: check_oracle.py SFDIR OUTDIR [--iterative] [--crosscheck]
                       [--cap SECONDS] [query ...]
Reads OUTDIR/<q>/ parquet (written by graft.Verify) and
OUTDIR/oracle_sql.json, runs each oracle in DuckDB over SFDIR's tables,
and compares values after sorting columns by name and rows by all
columns — the driver's hash contract.

Modes beyond the driver emulation:
  --iterative   for queries listed in OUTDIR/oracle_iter.json (written
                by graft.Verify), compute the oracle via the iterative
                program instead of the one-shot recursive CTE. The
                heavy SQL (candidate generation, funnel chain) still
                runs in DuckDB; only the recursion is replaced — by
                union-find (kind=cc) or the O(n) first-fit pack fold
                (kind=pack/pack_report) — and the FINAL frame is again
                produced by DuckDB SQL over the registered result, so
                dtypes/formatting match the one-shot path. This is the
                sf1 (10x bench scale) gate: the recursive CTEs exceed
                any reasonable cap there.
  --crosscheck  for iterative-capable queries, run BOTH paths and
                compare them to each other (and to Spark) — the
                equivalence proof, run at sf0.01.
  --cap N       per-oracle time cap in seconds (DuckDB interrupt);
                a capped query counts as failed.
"""
import json, os, sys, glob, threading
import duckdb

args = [a for a in sys.argv[1:]]
iterative = "--iterative" in args
crosscheck = "--crosscheck" in args
cap = None
if "--cap" in args:
    i = args.index("--cap")
    cap = float(args[i + 1])
    del args[i:i + 2]
args = [a for a in args if not a.startswith("--")]
sfdir, outdir = args[0], args[1]
only = set(args[2:])

# big-SF oracles (sf1) need spill: give DuckDB an explicit OUT-OF-REPO
# temp dir (a cwd-relative default once committed 3.3 GB of scratch to
# git) and a bounded memory limit so it spills instead of dying
def mem_limit():
    # ORACLE_MEM_LIMIT overrides; default derives from the machine
    # (75% of RAM, capped at 96GB) instead of assuming the 125 GB cert
    # box — the sf1 list-aggregation oracles (mm_decode_features
    # explodes documents per BYTE before list_reduce) want real
    # headroom there, but the same script is the sf0.01 dev gate on
    # arbitrary machines, where a hardcoded 96GB would let DuckDB OOM
    # the box before it spills (ADVICE r14)
    env = os.environ.get("ORACLE_MEM_LIMIT")
    if env:
        return env
    try:
        ram = os.sysconf("SC_PHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
        return f"{min(96, max(1, int(ram * 0.75 / 2**30)))}GB"
    except (ValueError, OSError):
        return "8GB"


def connect():
    c = duckdb.connect(config={
        "temp_directory": "/tmp/duckdb_oracle_spill",
        "memory_limit": mem_limit(),
    })
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        # driver testdata is a single file per table; GenScale-derived
        # SFs are Spark-written directories of part files
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return c


con = connect()

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
iter_path = f"{outdir}/oracle_iter.json"
iter_specs = json.load(open(iter_path)) if os.path.exists(iter_path) else {}


class CapTimeout(Exception):
    pass


# set by the cap timer BEFORE it interrupts DuckDB: con.interrupt()
# only cancels an in-flight query, so a cap firing while Python-side
# work (union-find, pack fold) runs would otherwise no-op — or poison
# the NEXT unrelated con.execute. run_iterative checks this flag
# between steps; with_cap turns a flag-set run into CapTimeout and
# absorbs any pending interrupt so later queries aren't mis-attributed.
cap_hit = threading.Event()


def check_cap():
    if cap_hit.is_set():
        raise CapTimeout(f"exceeded {cap}s cap (between steps)")


def with_cap(fn):
    """Run fn(); if --cap is set, interrupt DuckDB after the cap.
    A capped run always surfaces as CapTimeout, even if the interrupt
    landed between DuckDB queries."""
    if cap is None:
        return fn()
    cap_hit.clear()

    def fire():
        cap_hit.set()
        con.interrupt()

    timer = threading.Timer(cap, fire)
    timer.start()
    try:
        result = fn()
        check_cap()
        return result
    except Exception as e:
        if cap_hit.is_set() and not isinstance(e, CapTimeout):
            raise CapTimeout(f"exceeded {cap}s cap") from e
        raise
    finally:
        timer.cancel()
        if cap_hit.is_set():
            # absorb an interrupt that fired with no query in flight so
            # it can't cancel the next query of an UNRELATED oracle
            try:
                con.execute("SELECT 1")
            except Exception:
                pass


def union_find(edges_a, edges_b):
    """Union-find over the edge list; returns {node: component_min}."""
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(edges_a, edges_b):
        a, b = int(a), int(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps the root the component minimum
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
        else:
            parent.setdefault(a, ra)
            parent.setdefault(b, rb)
    nodes = set()
    for a, b in zip(edges_a, edges_b):
        nodes.add(int(a))
        nodes.add(int(b))
    return {n: find(n) for n in nodes}


def pack_fold(sized, capacity):
    """DatasetBuild.packAssign's exact first-fit rule over rows already
    in (split, shard, doc_id) fold order: returns [(doc_id, bin)]."""
    out = []
    cur = None
    bin_no, fill = 0, 0
    for split, shard, doc_id, tok in sized:
        key = (split, shard)
        if key != cur:
            cur, bin_no, fill = key, 0, tok
        elif fill + tok <= capacity:
            fill += tok
        else:
            bin_no, fill = bin_no + 1, tok
        out.append((int(doc_id), int(bin_no)))
    return out


def run_iterative(spec):
    import pandas as pd
    for view, sql in spec["views"].items():
        check_cap()
        con.execute(f"CREATE OR REPLACE TEMP TABLE {view} AS {sql}")
    kind = spec["kind"]
    check_cap()
    if kind == "cc":
        edges = con.execute(
            f"SELECT {spec['col1']}, {spec['col2']} FROM pairs_mat"
        ).fetchnumpy()
        labels = union_find(edges[spec["col1"]], edges[spec["col2"]])
        ldf = pd.DataFrame(
            {"node": list(labels.keys()), "label": list(labels.values())},
            dtype="int64")
        con.register("labels", ldf)
    else:  # pack / pack_report
        rows = con.execute(
            "SELECT split, shard, doc_id, n_tok FROM sized_mat "
            "ORDER BY split, shard, doc_id").fetchall()
        assign = pack_fold(rows, int(spec["capacity"]))
        adf = pd.DataFrame(assign, columns=["doc_id", "bin"],
                           dtype="int64")
        con.register("pack_assign", adf)
    check_cap()  # the Python fold runs uninterruptible; honor a cap
    out = con.execute(spec["final_sql"]).fetchdf()
    con.unregister("labels") if kind == "cc" else con.unregister(
        "pack_assign")
    for view in spec["views"]:
        con.execute(f"DROP TABLE IF EXISTS {view}")
    return out


def frames_equal(a, b, name, tag):
    """Driver-contract compare: column-name sort, row sort, str equal.
    Prints the first mismatch; returns True/False."""
    a = a.reindex(sorted(a.columns), axis=1)
    b = b.reindex(sorted(b.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"{name}: {tag} SCHEMA MISMATCH {list(a.columns)} "
              f"vs {list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"{name}: {tag} ROWS {len(a)} vs {len(b)}")
        return False
    av = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    bv = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    for c in av.columns:
        try:
            eq = (av[c].astype(str) == bv[c].astype(str)).all()
        except Exception:
            eq = False
        if not eq:
            diff = av[c].astype(str) != bv[c].astype(str)
            i = diff.idxmax()
            print(f"{name}: {tag} VALUE MISMATCH col={c} row={i} "
                  f"{av[c][i]!r} vs {bv[c][i]!r}")
            return False
    return True


fail = 0
since_reconnect = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    # A single long-lived DuckDB connection accumulates MEMORY MAPS,
    # not bytes: the r14 sf1 run died ~86 queries in on "bad
    # allocation" of 16 KB with 116 GB free — the process was pinned
    # at vm.max_map_count (65,530 maps), where every new mmap (any
    # small malloc, any thread stack) fails. Two-sided fix: the cert
    # box raises vm.max_map_count (sysctl, standard DB tuning), and a
    # fresh connection every 20 oracles keeps the map count bounded —
    # the base views recreate in milliseconds
    since_reconnect += 1
    if since_reconnect > 20:
        con.close()
        con = connect()
        since_reconnect = 0
        # warm the fresh connection (untimed): re-read each view's
        # parquet metadata so the first oracle after the boundary is
        # not measured cold against the --cap (ADVICE r14)
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents",
                  "embeddings"]:
            con.execute(f"SELECT count(*) FROM {t}").fetchall()
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        fail += 1
        continue
    try:
        spark = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
    except Exception as e:
        print(f"{name}: SPARK READ ERROR {type(e).__name__}: {e}")
        fail += 1
        continue
    use_iter = name in iter_specs and (iterative or crosscheck)
    try:
        if use_iter:
            oracle = with_cap(lambda: run_iterative(iter_specs[name]))
        else:
            oracle = with_cap(lambda: con.execute(sql).fetchdf())
    except Exception as e:
        print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
        fail += 1
        continue
    ok = frames_equal(spark, oracle, name, "")
    if ok and crosscheck and name in iter_specs:
        try:
            recursive = with_cap(lambda: con.execute(sql).fetchdf())
        except Exception as e:
            print(f"{name}: CROSSCHECK RECURSIVE ERROR "
                  f"{type(e).__name__}: {e}")
            fail += 1
            continue
        ok = frames_equal(oracle, recursive, name, "iter-vs-recursive")
        if ok:
            print(f"{name}: OK ({len(spark)} rows, crosschecked)")
        else:
            fail += 1
        continue
    if ok:
        tag = " iterative" if use_iter else ""
        print(f"{name}: OK ({len(spark)} rows{tag})")
    else:
        fail += 1
sys.exit(1 if fail else 0)
