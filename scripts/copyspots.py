"""Show WHERE a repo file overlaps a reference file, by shared token runs.

For a given (repo, reference) file pair, find maximal shared token runs
(length >= 6) and print them with the repo-side line numbers, longest
first.  Use this to target de-transcription restructuring precisely.

Usage: python scripts/copyspots.py <repo_file> <ref_file> [min_run]
"""

from __future__ import annotations

import io
import sys
import token
import tokenize
from pathlib import Path


def tokens_of(path: Path):
    """(token strings, start line numbers) with the copycheck filter."""
    src = path.read_text(errors="replace")
    toks, lines = [], []
    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type in (
            token.COMMENT,
            token.NL,
            token.NEWLINE,
            token.INDENT,
            token.DEDENT,
            token.STRING,
            token.ENCODING,
        ):
            continue
        toks.append(tok.string)
        lines.append(tok.start[0])
    return toks, lines


def main() -> int:
    repo_f = Path(sys.argv[1])
    ref_f = Path(sys.argv[2])
    min_run = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    a, a_lines = tokens_of(repo_f)
    b, _ = tokens_of(ref_f)

    n = 6
    bg = {tuple(b[i : i + n]) for i in range(len(b) - n + 1)}

    # Greedy maximal runs on the repo side: consecutive positions whose
    # 6-grams all appear in the reference.
    hits = [tuple(a[i : i + n]) in bg for i in range(len(a) - n + 1)]
    runs = []
    i = 0
    while i < len(hits):
        if hits[i]:
            j = i
            while j < len(hits) and hits[j]:
                j += 1
            run_len = (j - i) + n - 1
            if run_len >= min_run:
                runs.append((run_len, i, a_lines[i], a_lines[j + n - 2]))
            i = j
        else:
            i += 1

    total = sum(r[0] for r in runs)
    print(f"{len(runs)} shared runs >= {min_run} tokens, {total} tokens total")
    for run_len, i, l0, l1 in sorted(runs, reverse=True)[:40]:
        snippet = " ".join(a[i : i + min(run_len, 24)])
        print(f"  L{l0}-{l1} ({run_len} toks): {snippet}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
