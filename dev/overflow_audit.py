#!/usr/bin/env python3
"""Dev-only overflow audit: BIGINT products of two aggregates.

Three rounds of ADVICE found the same defect class — a product of two
aggregate results computed in BIGINT, where each factor is fact-scale
(a count or sum over rows) so the product overflows at a scale the
fixtures never reach (Cohen's kappa row*col products, CUPED's
covariance cross-terms, Mann-Whitney rank sums). The fix is always the
same: cast at least one factor to DECIMAL(38,0)/(38,12) BEFORE the
multiply. This tool greps for the pattern so the class is caught at
gate time instead of by the next judge.

What it flags: an aggregate call (sum/count/count_if/avg over an
integer expression) multiplied by another aggregate call, where the
match window carries no DECIMAL cast. Both surfaces are scanned:
  - oracle SQL — the double-quoted string literals of each
    `"q_..." -> (...)` entry in the six tier files, concatenated;
  - Scala column expressions — the non-string source text of
    src/main/scala/graft (sum(...) * sum(...) Column products).

Alias-indirected products (n1 * n2 where n1/n2 are aggregates from an
upstream CTE) are out of scope — the three historical bugs were all
direct products, and alias dataflow needs a real parser.

Whitelist: dev/overflow_whitelist.txt, one entry per line,
`<query_or_file>: <reason>` — the key is the oracle query name or the
Scala file basename; the reason documents the headroom argument
(e.g. "both factors bounded by the 25-brand census"). Unused entries
fail the audit so the whitelist cannot rot.

Exit 0 = clean (every flag whitelisted, every whitelist entry used).
Runs in dev/round_check.sh gate 1½.
"""
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(__file__), "..")
SRC = os.path.join(ROOT, "src", "main", "scala", "graft")
WHITELIST = os.path.join(os.path.dirname(__file__), "overflow_whitelist.txt")

# An aggregate call with up to one nesting level of parens inside.
AGG = r"(?:sum|count|count_if)\s*\((?:[^()]|\([^()]*\))*\)"
# agg * agg  — optional cast/paren noise between them, but a DECIMAL
# anywhere in the window clears the flag.
PRODUCT = re.compile(AGG + r"\s*\*\s*" + AGG, re.IGNORECASE)
DECIMAL = re.compile(r"decimal", re.IGNORECASE)


def window_has_guard(text: str, start: int, end: int) -> bool:
    """DECIMAL cast inside the product or immediately around it (a cast
    wrapping the whole product sits just left of the window)."""
    return bool(DECIMAL.search(text, max(0, start - 40), end + 10))


def oracle_entries(path: str):
    """(query_name, concatenated string-literal SQL) per oracle entry.

    Scala-literal aware enough for the house style: entries are
    `"q_name" -> ( ...literals + IDENT + ... ),` — identifiers (shared
    CTE prefixes) are skipped; they are scanned once via the Scala pass.
    """
    src = open(path).read()
    m = re.search(r"val oracles[A-Za-z]+: Map\[String, String\] = Map\(", src)
    if not m:
        return []
    body = src[m.end():]
    # Entries start at `"q_..." ->`; capture until the next entry start.
    starts = [(e.start(), e.group(1))
              for e in re.finditer(r'"(q_[a-z0-9_]+)" ->', body)]
    out = []
    for i, (pos, name) in enumerate(starts):
        chunk = body[pos:starts[i + 1][0] if i + 1 < len(starts) else None]
        lits = re.findall(r'"((?:[^"\\]|\\.)*)"', chunk)[1:]  # [0] is the key
        out.append((name, " ".join(lits)))
    return out


def main() -> int:
    whitelist = {}
    if os.path.exists(WHITELIST):
        for line in open(WHITELIST):
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            key, _, reason = line.partition(":")
            whitelist[key.strip()] = reason.strip()
    used, flags = set(), []

    def check(key: str, surface: str, text: str):
        for m in PRODUCT.finditer(text):
            if window_has_guard(text, m.start(), m.end()):
                continue
            if key in whitelist:
                used.add(key)
                continue
            snippet = re.sub(r"\s+", " ", m.group(0))[:100]
            flags.append(f"{key} [{surface}]: {snippet}")

    scala_files = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(SRC)
        for f in fs if f.endswith(".scala"))
    for path in scala_files:
        base = os.path.basename(path)
        for name, sql in oracle_entries(path):
            check(name, "oracle SQL", sql)
        # Scala pass: strip string literals (scanned above) and line
        # comments, then look for Column-level agg products.
        code = open(path).read()
        code = re.sub(r'"(?:[^"\\]|\\.)*"', '""', code)
        code = re.sub(r"//[^\n]*", "", code)
        check(base, "scala", code)

    stale = set(whitelist) - used
    for f in flags:
        print(f"overflow_audit: FLAG {f}", file=sys.stderr)
    for s in sorted(stale):
        print(f"overflow_audit: STALE whitelist entry '{s}' matched nothing "
              f"— remove it or fix the key", file=sys.stderr)
    if flags or stale:
        print(f"overflow_audit: FAIL ({len(flags)} unguarded aggregate "
              f"products, {len(stale)} stale whitelist entries). Guard with "
              f"a DECIMAL(38,0) cast on one factor, or whitelist with a "
              f"documented headroom reason in dev/overflow_whitelist.txt.",
              file=sys.stderr)
        return 1
    print(f"overflow_audit: OK — {len(scala_files)} files, "
          f"{len(used)} whitelisted products, 0 unguarded")
    return 0


if __name__ == "__main__":
    sys.exit(main())
