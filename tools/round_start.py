#!/usr/bin/env python3
"""Round-entry evidence hygiene (VERDICT r18 item 7).

Run once when a round starts. It:
  1. archives every stamped receipt found under /tmp (files named
     `receipt_*.txt`, written by tools/receipts.py next to the dump
     they verified) into /root/repo/receipts/archive/ — so prior-round
     evidence survives /tmp churn and ends up committed;
  2. deletes killed-DuckDB spill residue (/tmp/duck_spill contents and
     /root/repo/.tmp — tens of GB after any OOM-killed oracle);
  3. lists UNSTAMPED evidence strays (top-level /tmp/*.txt and
     /tmp/*.log) so they get deleted or re-emitted stamped instead of
     silently trusted — the r17/r18 stale-receipt trap
     (/tmp/pipe02_staged.txt described a different data generation).

Usage: python3 tools/round_start.py [--delete-strays]
"""
import os, shutil, sys
from pathlib import Path

repo = Path("/root/repo")
archive = repo / "receipts" / "archive"
archive.mkdir(parents=True, exist_ok=True)

n_arch = 0
for p in Path("/tmp").glob("**/receipt_*.txt"):
    try:
        dst = archive / p.name
        if not dst.exists() or dst.read_bytes() != p.read_bytes():
            shutil.copy2(p, dst)
            n_arch += 1
    except OSError:
        pass
print(f"archived {n_arch} receipt(s) into {archive}")

def _size(f):
    # live DuckDB spill churn can delete a file between glob and stat
    try:
        return f.stat().st_size if f.is_file() else 0
    except OSError:
        return 0


for spill in (Path("/tmp/duck_spill"), repo / ".tmp"):
    if spill.exists():
        sz = sum(_size(f) for f in spill.glob("**/*"))
        shutil.rmtree(spill, ignore_errors=True)
        print(f"cleared {spill} ({sz / 1e9:.1f} GB)")

strays = [p for pat in ("*.txt", "*.log") for p in Path("/tmp").glob(pat)]
if strays:
    act = "--delete-strays" in sys.argv
    for p in strays:
        if act:
            # archive-then-remove (ADVICE r19): strays may be evidence
            # from other tooling — never destroy the only copy
            try:
                dst = archive / f"stray_{p.name}"
                if not dst.exists():
                    shutil.copy2(p, dst)
                p.unlink(missing_ok=True)
                print(f"archived+removed stray: {p} -> {dst}")
            except OSError as e:
                print(f"stray NOT removed ({e}): {p}")
        else:
            print(f"STRAY (unstamped): {p}")
    if not act:
        print("re-run with --delete-strays (archives into receipts/archive first)")
