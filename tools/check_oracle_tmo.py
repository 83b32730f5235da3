#!/usr/bin/env python3
"""check_oracle.py with a per-query wall-clock budget.

Usage: python3 tools/check_oracle_tmo.py <sfDir> <outDir> [timeoutSec] [only...]

Runs each oracle in its own subprocess (DuckDB has no query timeout);
queries exceeding the budget print `TMO <name>` and are meant to be
re-run individually in a long background pass. Builder-side only —
the driver's compare is authoritative.
"""
import json, shutil, sys, subprocess, os, tempfile

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    tmo = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    only = set(sys.argv[4:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in oracle if not only or n in only)
    ok = fails = tmos = 0
    slow = []
    # scratch OUTSIDE outDir (a stale .one<pid> inside the verify dir
    # survived crashed runs and could be silently reused); mkdtemp is
    # fresh per run and removed in the finally below.
    scratch = tempfile.mkdtemp(prefix="graft-oracle-one-")
    try:
        for name in names:
            one = {name: oracle[name]}
            # check_oracle reads <outDir>/oracle_sql.json: point it at
            # the scratch dir holding just this entry + a symlink to
            # the dump
            with open(f"{scratch}/oracle_sql.json", "w") as f:
                json.dump(one, f)
            link = f"{scratch}/{name}"
            if not os.path.islink(link):
                os.symlink(f"{out_dir}/{name}", link)
            try:
                r = subprocess.run(
                    [sys.executable, os.path.join(os.path.dirname(__file__),
                                                  "check_oracle.py"),
                     sf_dir, scratch],
                    capture_output=True, text=True, timeout=tmo)
                out = (r.stdout + r.stderr).strip()
                if r.returncode == 0 and "FAIL" not in out:
                    ok += 1
                    print(out.splitlines()[-1] if out else f"OK   {name}")
                else:
                    fails += 1
                    print(out)
            except subprocess.TimeoutExpired:
                tmos += 1
                slow.append(name)
                print(f"TMO  {name} (> {tmo}s)")
            os.unlink(link)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    print(f"== ok={ok} fail={fails} tmo={tmos}")
    if slow:
        print("slow: " + " ".join(slow))
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
