"""Alignment accuracy evaluation against wgsim truth coordinates.

Python port of the `alneval` mode of the reference's evaluator
(Test/Simulator/wgsim-master/wgsim_eval.pl:32-110): the simulator
embeds each read pair's true (chrom, left, right) in the read name as
``<chrom>_<left>_<right>_...``; an alignment is correct when its
clip-adjusted coordinate is within ``gap`` (default 20) bp of the
truth on the same chromosome — forward reads compare POS to the left
coordinate, reverse reads compare the CIGAR-derived right end to the
right coordinate, each also allowing the alternate clip adjustment.

Counting matches the Perl exactly: per-``int(MAPQ/10)`` bucket wrong /
mapped counts and cumulative totals from the highest bucket down.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Iterable, List, Optional, Tuple

_NAME_RE = re.compile(r"^(\S+)_(\d+)_(\d+)_")
_CIG_REF = re.compile(r"(\d+)[MDN]")
_CLIP_HEAD = re.compile(r"^(\d+)[SH]")
_CLIP_TAIL = re.compile(r"(\d+)[SH]$")


@dataclass
class AlnEval:
    gap: int = 20
    # per-bucket (MAPQ//10): [mapped, wrong]
    c0: List[int] = field(default_factory=lambda: [0] * 26)
    c1: List[int] = field(default_factory=lambda: [0] * 26)
    n_unmapped: int = 0
    n_records: int = 0
    max_q: int = 0
    wrong_lines: List[str] = field(default_factory=list)
    keep_wrong: bool = False

    def add_sam_line(self, line: str) -> None:
        if line.startswith("@"):
            return
        t = line.rstrip("\n").split("\t")
        if len(t) < 11:
            return
        self.n_records += 1
        flag = int(t[1])
        chrom, left = t[2], int(t[3])
        if (flag & 0x4) or chrom == "*":
            self.n_unmapped += 1
            return
        q = int(t[4]) // 10
        self.max_q = max(self.max_q, q)
        rght = left
        for m in _CIG_REF.finditer(t[5]):
            rght += int(m.group(1))
        rght -= 1
        left0, rght0 = left, rght
        mh = _CLIP_HEAD.search(t[5])
        mt = _CLIP_TAIL.search(t[5])
        if mh:
            left -= int(mh.group(1))
            rght0 += int(mh.group(1))
        if mt:
            rght += int(mt.group(1))
            left0 -= int(mt.group(1))
        m = _NAME_RE.match(t[0])
        if not m:
            return
        tchrom, tleft, trght = m.group(1), int(m.group(2)), int(m.group(3))
        correct = True
        if tchrom != chrom:
            correct = False
        elif flag & 0x10:
            if abs(trght - rght) > self.gap and abs(trght - rght0) > self.gap:
                correct = False
        else:
            if abs(tleft - left) > self.gap and abs(tleft - left0) > self.gap:
                correct = False
        self.c0[q] += 1
        if not correct:
            self.c1[q] += 1
            if self.keep_wrong:
                self.wrong_lines.append(line)

    def table(self) -> List[Tuple[int, int, int, int, float]]:
        """[(qual_bucket, n_wrong, n_mapped, cum_mapped, cum_err_rate)]
        from the highest bucket down — the Perl report's rows."""
        rows = []
        cc0 = cc1 = 0
        for i in range(self.max_q, -1, -1):
            cc0 += self.c0[i]
            cc1 += self.c1[i]
            if cc0:
                rows.append((i, self.c1[i], self.c0[i], cc0, cc1 / cc0))
        return rows

    @property
    def n_mapped(self) -> int:
        return sum(self.c0)

    @property
    def n_wrong(self) -> int:
        return sum(self.c1)

    def report(self) -> str:
        out = ["qual n_wrong / n_mapped  total_mapped  total_error_rate"]
        for i, w, n, cum, rate in self.table():
            out.append(f"{i:02d}x {w:12d} / {n:<12d}  {cum:12d}  {rate:.3e}")
        out.append(
            f"# mapped={self.n_mapped} wrong={self.n_wrong} "
            f"unmapped={self.n_unmapped}"
        )
        return "\n".join(out)


def alneval(
    sam_lines: Iterable[str], gap: int = 20, keep_wrong: bool = False
) -> AlnEval:
    ev = AlnEval(gap=gap, keep_wrong=keep_wrong)
    for line in sam_lines:
        ev.add_sam_line(line)
    return ev


def _main(argv: Optional[list] = None):
    import argparse
    import sys

    ap = argparse.ArgumentParser(prog="salt-tpu-alneval")
    ap.add_argument("-g", "--gap", type=int, default=20)
    ap.add_argument("-p", "--print-wrong", action="store_true")
    ap.add_argument("sam", nargs="?", default="-")
    args = ap.parse_args(argv)
    fp = sys.stdin if args.sam == "-" else open(args.sam)
    ev = alneval(fp, gap=args.gap, keep_wrong=args.print_wrong)
    print(ev.report())
    if args.print_wrong:
        for line in ev.wrong_lines:
            sys.stderr.write(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
