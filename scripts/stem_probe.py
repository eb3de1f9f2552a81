"""Probe helper: diff an atra_spark stemmer against PostgreSQL 15's
embedded official Snowball implementation (ts_lexize over the g_<lang>
dictionaries created by scripts/gen_snowball_goldens.py).

Usage:
    python scripts/stem_probe.py <language> word1 word2 ...
    python scripts/stem_probe.py <language> --file words.txt

Prints mismatches as `word  want  got`. Requires the throwaway PG
instance from gen_snowball_goldens.py to be running at /tmp/pgstem.
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PSQL = ["psql", "-h", "/tmp/pgstem", "-U", "postgres", "-X", "-q", "-t", "-A"]


def oracle(lang: str, words: list[str]) -> dict[str, str]:
    """word -> official Snowball stem, batched through one psql call."""
    out: dict[str, str] = {}
    for i in range(0, len(words), 500):
        chunk = words[i:i + 500]
        vals = ",".join("('%s')" % w.replace("'", "''") for w in chunk)
        q = (
            f"SELECT w || E'\\t' || coalesce((ts_lexize('g_{lang}', w))[1], w) "
            f"FROM (VALUES {vals}) t(w)"
        )
        r = subprocess.run(PSQL + ["-c", q], capture_output=True, text=True)
        if r.returncode != 0:
            raise RuntimeError(r.stderr)
        for line in r.stdout.splitlines():
            if "\t" in line:
                w, s = line.split("\t", 1)
                out[w] = s
    return out


def diff(lang: str, words: list[str], fn) -> list[tuple[str, str, str]]:
    want = oracle(lang, words)
    fails = []
    for w in words:
        if w not in want:
            continue
        got = fn(w)
        if got != want[w]:
            fails.append((w, want[w], got))
    return fails


def main() -> None:
    sys.path.insert(0, REPO)
    from atra_spark.functions.stemmer import get_stemmer

    lang = sys.argv[1]
    if sys.argv[2] == "--file":
        words = [w.strip() for w in open(sys.argv[3], encoding="utf-8") if w.strip()]
    else:
        words = sys.argv[2:]
    fails = diff(lang, words, get_stemmer(lang))
    print(f"{len(words)} words, {len(fails)} mismatches")
    for w, want, got in fails[:60]:
        print(f"{w}\t{want}\t{got}")


if __name__ == "__main__":
    main()
