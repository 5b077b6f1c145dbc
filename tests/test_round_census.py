"""Rounding-site census (round-9 verdict task 2 — the durable form of
the six one-off ROUND-tie fixes: q325, q416, q475, q480, q486, q384).

``ROUND(double, k)`` is ENGINE-AMBIGUOUS at representational ties:
Spark rounds the double's shortest decimal representation
(``BigDecimal.valueOf``) HALF_UP, DuckDB decides on the binary value,
so a value whose shortest repr lands exactly on a ``.5e-k`` boundary
— any exact integer ratio with a dyadic-ish denominator, e.g.
``sg/nt`` with ``nt = 16`` (the r8 q384 hunt find) — rounds to
DIFFERENT grid points on the two engines. Six property-hunt finds of
this class in five rounds showed per-site fixes don't converge.

Round 9 made the class EXTINCT mechanically: every final-output
rounding site in the query registry (472 ``F.round`` sites, 526
oracle-SQL ``ROUND`` sites at migration time) now goes through ONE
shared convention — ``_util.dround`` on the Spark side and the
textually identical ``FLOOR(CAST(x AS DOUBLE) * 10^k + 0.5) / 10^k``
form in the DuckDB oracle (``_util.sql_dround`` emits it). That form
is pure IEEE-754 arithmetic — multiply, add, floor, divide on the
same doubles — so both engines produce bit-identical results for
EVERY input, ties included; there is no decimal-repr step left to
disagree on. (Exact-DECIMAL rounding — ``dsum``'s DECIMAL(18,s)
sums — never had the ambiguity: both engines round exact decimals
half-away-from-zero.)

This census pins the extinction: a NEW ``F.round``/``F.bround`` call
or a bare ``ROUND(`` in an oracle string anywhere in the package
fails the suite until it is rewritten onto the dround grid. Unlike
the window/broadcast audits there is no allowlist — the safe form is
total, so the invariant is simply ZERO bare sites.
"""

from __future__ import annotations

import ast
import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "hadoop_brotli_spark"

# _util.py defines the convention (its docstrings NAME the banned
# forms); everything else in the package is scanned.
EXEMPT = {"queries/_util.py"}

BANNED_ATTRS = {"round", "bround"}

# word-boundary SQL ROUND call — case-sensitive and paren-adjacent
# (the repo's SQL style is uppercase keywords; lowercase `round(` in
# prose docstrings like "per round (the q64 rule)" must not trip the
# census, and the Spark-side lowercase path is the AST test's job)
SQL_ROUND = re.compile(r"(?<![A-Za-z0-9_])ROUND\(")


def _py_files():
    for path in sorted(PKG.rglob("*.py")):
        rel = str(path.relative_to(PKG))
        if rel in EXEMPT:
            continue
        yield rel, path


def test_no_bare_f_round_sites():
    """No F.round / F.bround call anywhere in the package."""
    offenders = []
    for rel, path in _py_files():
        tree = ast.parse(path.read_text())
        for n in ast.walk(tree):
            if (
                isinstance(n, ast.Call)
                and isinstance(n.func, ast.Attribute)
                and n.func.attr in BANNED_ATTRS
                and isinstance(n.func.value, ast.Name)
                and n.func.value.id == "F"
            ):
                offenders.append(f"{rel}:{n.lineno}")
    assert offenders == [], (
        "engine-ambiguous F.round/F.bround site(s) — use _util.dround "
        f"(see module docstring): {offenders}"
    )


def test_no_bare_sql_round_in_strings():
    """No ROUND( inside any string constant (oracle SQL, F.expr)."""
    offenders = []
    for rel, path in _py_files():
        tree = ast.parse(path.read_text())
        for n in ast.walk(tree):
            if isinstance(n, ast.Constant) and isinstance(n.value, str):
                if SQL_ROUND.search(n.value):
                    offenders.append(f"{rel}:{n.lineno}")
    assert offenders == [], (
        "engine-ambiguous SQL ROUND( site(s) — use the "
        "FLOOR(CAST(x AS DOUBLE) * 10^k + 0.5) / 10^k grid form "
        f"(_util.sql_dround emits it): {offenders}"
    )


def test_dround_and_sql_dround_agree_textually():
    """The two helpers emit the same arithmetic (same literals)."""
    from hadoop_brotli_spark.queries._util import sql_dround

    assert sql_dround("x", 6) == (
        "(FLOOR(CAST(x AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)"
    )
    assert sql_dround("x") == "(FLOOR(CAST(x AS DOUBLE) * 1.0 + 0.5) / 1.0)"
