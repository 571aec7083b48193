"""Driver-signal staleness report + next-window proposal.

The driver hash-checks the FIRST 50 registry queries per round; keeping
every query's signal fresh is a rotation problem. This tool reads the
CORRECTNESS_r*.json records and prints, per registry query, the last
round its driver signal was green (hash-match for oracle-backed rows,
any recorded appearance for rows-only ones), then proposes the next
50-slot window in strict staleness order:

1. oracle-backed queries with NO green driver row ever (new additions
   must land here — the zero-visibility-debt invariant);
2. rows-only queries by last recorded appearance;
3. oracle-backed queries by last green round, registry order as the
   tie-break.

Usage: python staleness.py [--window-only]
The proposal is a starting point — family-value reweighting (VERDICT r6
item #1 style) is a judgement call the notes should record.
"""

from __future__ import annotations

import ast
import functools
import glob
import json
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
PKG = "pipeline_pyspark_etl_imdb_spark"
TOPLEVEL = "<toplevel>"  # per-module pseudo-node: constants + module code


# --------------------------------------------------------------------------
# Change-aware promotion (VERDICT r8 item #1).
#
# A green driver row certifies the query's code AS OF that round; a later
# change to any function on the query's plan-construction path invalidates
# the certificate even though the row stays "green" in the records. The
# rotation must therefore promote CHANGED-SINCE-GREEN queries ahead of
# merely-stale ones. Granularity is the FUNCTION, not the file: file-level
# diffing would promote the whole 1000-line text battery whenever one
# call site moves (r8 touched 3 of text.py's ~40 functions), starving the
# staleness tail. Mechanics:
#
#   * round markers = the driver's "round N: verdict/..." commits; the
#     tree at marker(N) is the code CORRECTNESS_rN.json certified;
#   * at each marker revision, every package module is parsed (ast) into
#     top-level function/class nodes plus a <toplevel> pseudo-node for
#     module constants; imports (any depth — operators use function-local
#     imports) build the cross-module alias map;
#   * each registry query's defining expression (dict-literal entry,
#     QUERIES["x"] = ..., or the named wrapper it points at) seeds a BFS
#     over the name-reference call graph; the query is CHANGED between
#     marker(A) and marker(B) iff any reached node's ast.dump differs
#     (position-independent, so pure reorders don't fire);
#   * registry.py's <toplevel> dump excludes QUERIES/_R*_WINDOW/the
#     reorder block — the rotation itself must not promote everything.
#
# Known limits (documented, deliberate): session.py config changes and
# plans/oracles.py edits don't promote (the former is global — handle as
# a manual full-rotation call; the latter is verification-side and the
# LOCAL oracle gates re-run every oracle every round); dynamic dispatch
# (getattr) is invisible to the AST walk — none is used on query paths.
# --------------------------------------------------------------------------


def _git(*args: str) -> str:
    out = subprocess.run(
        ["git", *args], cwd=HERE, capture_output=True, text=True
    )
    if out.returncode != 0:
        raise SystemExit(f"staleness: git {' '.join(args)} failed: {out.stderr.strip()}")
    return out.stdout


@functools.lru_cache(maxsize=None)
def _round_markers() -> dict[int, str]:
    """round -> the driver's end-of-round marker commit (oldest first so a
    rewritten history keeps the FIRST marker per round)."""
    markers: dict[int, str] = {}
    for line in reversed(_git("log", "--format=%H %s").splitlines()):
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            markers.setdefault(int(m.group(1)), sha)
    return markers


def _marker(round_no: int) -> str:
    markers = _round_markers()
    if round_no not in markers:
        raise SystemExit(
            f"staleness: no 'round {round_no}: verdict' marker commit in this "
            "checkout — a recorded round's history is missing; the change-aware "
            "rotation cannot attribute code to driver rows without it"
        )
    return markers[round_no]


class _RevIndex:
    """Per-revision static index: module -> {node -> ast dump}, the alias
    maps, and per-node name references."""

    def __init__(
        self, rev: str, sources: dict[str, str] | None = None
    ) -> None:
        """``sources`` (tests only): {"<PKG-relative path>": source} used
        instead of git — keeps the resolution mechanics unit-testable
        without fabricating history."""
        self.rev = rev
        # module dotted path (relative to PKG) -> parsed pieces
        self.dumps: dict[str, dict[str, str]] = {}
        self.refs: dict[str, dict[str, set[tuple[str | None, str]]]] = {}
        self.aliases: dict[str, dict[str, tuple[str, str | None]]] = {}
        self.toplevel_names: dict[str, set[str]] = {}
        if sources is None:
            files = [
                f
                for f in _git(
                    "ls-tree", "-r", "--name-only", rev, "--", PKG
                ).splitlines()
                if f.endswith(".py")
            ]
            mods = {self._mod_of(f): f for f in files}
            read = lambda path: _git("show", f"{rev}:{path}")  # noqa: E731
        else:
            mods = {self._mod_of(f"{PKG}/{p}"): p for p in sources}
            read = sources.__getitem__
        self.modules = set(mods)
        for mod, path in mods.items():
            try:
                tree = ast.parse(read(path))
            except SyntaxError:
                continue
            self._index_module(mod, tree)

    @staticmethod
    def _mod_of(path: str) -> str:
        rel = path[len(PKG) + 1 : -3]  # strip "PKG/" and ".py"
        if rel.endswith("/__init__"):
            rel = rel[: -len("/__init__")]
        return rel.replace("/", ".")

    def _index_module(self, mod: str, tree: ast.Module) -> None:
        dumps: dict[str, str] = {}
        refs: dict[str, set[tuple[str | None, str]]] = {}
        alias: dict[str, tuple[str, str | None]] = {}
        top_stmts: list[ast.stmt] = []
        top_names: set[str] = set()

        # imports at ANY depth feed one module-wide alias map (operators
        # use function-local imports; collisions across functions don't
        # occur in this codebase and would only over-approximate)
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom):
                base = self._resolve_import_base_from(mod, node)
                if base is None:
                    continue
                for a in node.names:
                    name = a.asname or a.name
                    candidate = f"{base}.{a.name}" if base else a.name
                    if candidate in getattr(self, "modules", set()):
                        alias[name] = (candidate, None)  # module alias
                    else:
                        alias[name] = (base, a.name)  # symbol from base
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name == PKG or a.name.startswith(PKG + "."):
                        name = a.asname or a.name.split(".")[0]
                        alias[name] = (a.name[len(PKG) + 1 :] or "", None)

        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                dumps[node.name] = ast.dump(node)
                refs[node.name] = self._collect_refs(node)
                continue
            # single-name module constants get their OWN node so a change
            # to ROWS_ONLY doesn't promote a query that only reads
            # KNN_QUERY_IDS; everything else pools in <toplevel>
            tgt = None
            if isinstance(node, ast.Assign) and len(node.targets) == 1:
                tgt = node.targets[0]
            elif isinstance(node, ast.AnnAssign):
                tgt = node.target
            if isinstance(tgt, ast.Name) and tgt.id not in dumps:
                dumps[tgt.id] = ast.dump(node)
                refs[tgt.id] = self._collect_refs(node)
                top_names.add(tgt.id)
                continue
            top_stmts.append(node)
            for t in ast.walk(node):
                if isinstance(t, (ast.Assign, ast.AnnAssign)):
                    targets = t.targets if isinstance(t, ast.Assign) else [t.target]
                    for tg in targets:
                        if isinstance(tg, ast.Name):
                            top_names.add(tg.id)

        # module pseudo-node; registry's rotation state is excluded so the
        # window reorder itself never promotes (see module comment)
        def _keep(st: ast.stmt) -> bool:
            # imports are semantic only through alias RESOLUTION (a
            # retargeted alias changes which nodes the BFS reaches, which
            # the union-compare already catches); docstrings are inert —
            # keeping either in the dump promotes whole modules on
            # cosmetic edits
            if isinstance(st, (ast.Import, ast.ImportFrom)):
                return False
            if isinstance(st, ast.Expr) and isinstance(st.value, ast.Constant):
                return False
            if mod != "plans.registry":
                return True
            names: set[str] = set()
            if isinstance(st, ast.Assign):
                for t in st.targets:
                    if isinstance(t, ast.Name):
                        names.add(t.id)
                    elif isinstance(t, ast.Subscript) and isinstance(t.value, ast.Name):
                        names.add(t.value.id)  # QUERIES["x"] = wrapper
            elif isinstance(st, ast.AnnAssign):
                t = st.target
                if isinstance(t, ast.Name):
                    names = {t.id}
                elif isinstance(t, ast.Subscript) and isinstance(t.value, ast.Name):
                    names = {t.value.id}
            elif isinstance(st, ast.Assert):
                return False  # the reorder block's shape asserts
            return not any(re.fullmatch(r"QUERIES|_R\d+_WINDOW", n) for n in names)

        kept = [st for st in top_stmts if _keep(st)]
        dumps[TOPLEVEL] = "\n".join(ast.dump(st) for st in kept)
        refs[TOPLEVEL] = set().union(*(self._collect_refs(st) for st in kept)) if kept else set()

        self.dumps[mod] = dumps
        self.refs[mod] = refs
        self.aliases[mod] = alias
        self.toplevel_names[mod] = top_names

    def _resolve_import_base_from(self, mod: str, node: ast.ImportFrom) -> str | None:
        if node.level == 0:
            target = node.module or ""
            if target == PKG:
                return ""
            if target.startswith(PKG + "."):
                return target[len(PKG) + 1 :]
            return None
        parts = mod.split(".")[:-1]
        up = node.level - 1
        if up > len(parts):
            return None
        base = parts[: len(parts) - up]
        if node.module:
            base = base + node.module.split(".")
        return ".".join(base)

    @staticmethod
    def _collect_refs(node: ast.AST) -> set[tuple[str | None, str]]:
        """Name references: (alias, attr) for alias.attr, (None, name) for
        bare names."""
        out: set[tuple[str | None, str]] = set()
        for n in ast.walk(node):
            if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
                out.add((n.value.id, n.attr))
            elif isinstance(n, ast.Name):
                out.add((None, n.id))
        return out

    def resolve(self, mod: str, ref: tuple[str | None, str]) -> tuple[str, str] | None:
        """A reference inside ``mod`` -> (module, node) or None if external."""
        alias = self.aliases.get(mod, {})
        base, name = ref
        if base is None:
            if name in self.dumps.get(mod, {}):
                return (mod, name)
            if name in alias:
                tmod, tname = alias[name]
                if tname is None:
                    return None  # bare module alias: wait for alias.attr
                if tmod in self.dumps and tname in self.dumps[tmod]:
                    return (tmod, tname)
                if tmod in self.dumps:
                    return (tmod, TOPLEVEL)  # imported module constant
                return None
            if name in self.toplevel_names.get(mod, set()):
                return (mod, TOPLEVEL)  # module constant
            return None
        # alias.attr
        if base in alias:
            tmod, tname = alias[base]
            if tname is None and tmod in self.dumps:  # module alias
                if name in self.dumps[tmod]:
                    return (tmod, name)
                return (tmod, TOPLEVEL)  # module constant / unresolved attr
        return None

    def reach(self, seeds: set[tuple[str, str]]) -> set[tuple[str, str]]:
        seen: set[tuple[str, str]] = set()
        stack = [s for s in seeds if s[0] in self.dumps and s[1] in self.dumps[s[0]]]
        while stack:
            node = stack.pop()
            if node in seen:
                continue
            seen.add(node)
            mod, name = node
            for ref in self.refs.get(mod, {}).get(name, ()):
                nxt = self.resolve(mod, ref)
                if nxt and nxt not in seen:
                    stack.append(nxt)
        return seen


@functools.lru_cache(maxsize=None)
def _rev_index(rev: str) -> _RevIndex:
    return _RevIndex(rev)


@functools.lru_cache(maxsize=None)
def _registry_exprs(rev: str) -> dict[str, ast.AST]:
    """query name -> the ast node of its defining registry expression."""
    src = _git("show", f"{rev}:{PKG}/plans/registry.py")
    tree = ast.parse(src)
    fdefs = {
        n.name: n
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    }
    exprs: dict[str, ast.AST] = {}

    def _entry(key: ast.expr, val: ast.expr) -> None:
        if isinstance(key, ast.Constant) and isinstance(key.value, str):
            if isinstance(val, ast.Name) and val.id in fdefs:
                exprs[key.value] = fdefs[val.id]
            else:
                exprs[key.value] = val

    for node in tree.body:
        tgt = val = None
        if isinstance(node, ast.AnnAssign):
            tgt, val = node.target, node.value
        elif isinstance(node, ast.Assign) and len(node.targets) == 1:
            tgt, val = node.targets[0], node.value
        if val is None:
            continue
        if isinstance(tgt, ast.Name) and tgt.id == "QUERIES" and isinstance(val, ast.Dict):
            for k, v in zip(val.keys, val.values):
                _entry(k, v)
        elif (
            isinstance(tgt, ast.Subscript)
            and isinstance(tgt.value, ast.Name)
            and tgt.value.id == "QUERIES"
            and isinstance(tgt.slice, ast.Constant)
        ):
            _entry(tgt.slice, val)
    return exprs


def _query_state(rev: str, name: str) -> tuple[str, frozenset[tuple[str, str]]] | None:
    """(expr dump, reached call-graph node dumps are compared separately)
    -> (position-independent expr dump, reachable node set) or None if the
    query does not exist at this revision."""
    exprs = _registry_exprs(rev)
    if name not in exprs:
        return None
    idx = _rev_index(rev)
    node = exprs[name]
    seeds: set[tuple[str, str]] = set()
    for ref in _RevIndex._collect_refs(node):
        got = idx.resolve("plans.registry", ref)
        if got:
            seeds.add(got)
    return ast.dump(node), frozenset(idx.reach(seeds))


def changed_nodes(name: str, round_a: int, round_b: int) -> list[str]:
    """The reachable call-graph nodes whose AST differs between the marker
    commits of round_a and round_b (['<registry expr>'] when the defining
    expression itself changed; ['<missing>'] when the query doesn't exist
    at one revision)."""
    rev_a, rev_b = _marker(round_a), _marker(round_b)
    sa, sb = _query_state(rev_a, name), _query_state(rev_b, name)
    if sa is None or sb is None:
        return ["<missing>"]
    out = []
    if sa[0] != sb[0]:
        out.append("<registry expr>")
    ia, ib = _rev_index(rev_a), _rev_index(rev_b)
    for mod, node in sorted(sa[1] | sb[1]):
        if ia.dumps.get(mod, {}).get(node) != ib.dumps.get(mod, {}).get(node):
            out.append(f"{mod}.{node}")
    return out


@functools.lru_cache(maxsize=None)
def query_changed(name: str, round_a: int, round_b: int) -> bool:
    """True iff the query's defining expression or ANY function reachable
    from it differs between the marker commits of round_a and round_b."""
    return bool(changed_nodes(name, round_a, round_b))


def load_history(
    through_round: int | None = None,
) -> tuple[dict[str, int], dict[str, int], int]:
    """Signal history from the CORRECTNESS_r*.json records, optionally
    truncated to rounds <= ``through_round`` (so a window chosen at round
    N can be re-derived — and regression-tested — after later records
    land)."""
    last_green: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    max_round = 0
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if through_round is not None and rnd > through_round:
            continue
        max_round = max(max_round, rnd)
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in data.items():
            last_seen[name] = max(last_seen.get(name, 0), rnd)
            if (
                row.get("hash_match")
                and row.get("rows_match")
                and row.get("schema_match")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    # fail LOUDLY on a gapped record set (VERDICT r8 missing#2): a clone
    # that lost a round's CORRECTNESS file would silently compute stale
    # signals against truncated history
    missing = [
        r
        for r in range(1, max_round + 1)
        if not os.path.exists(os.path.join(HERE, f"CORRECTNESS_r{r:02d}.json"))
    ]
    if missing:
        raise SystemExit(
            f"staleness: missing CORRECTNESS record(s) for round(s) {missing} "
            "— restore the committed artifacts before trusting any rotation"
        )
    return last_green, last_seen, max_round


def propose_window(through_round: int | None = None) -> list[str]:
    """The 50-slot window given records through ``through_round`` (None =
    all records). Three tiers, each staleness-ordered with current
    registry order as the tie-break:

    1. oracle-backed queries with NO green driver row (new additions);
    2. CHANGED-SINCE-SIGNAL queries (query_changed between the marker of
       their last signal round and the marker of ``through_round``): their
       green row certifies code that no longer exists, which is worse
       visibility debt than any staleness (VERDICT r8 item #1);
    3. everything else by last signal round.

    Deterministic for a fixed through_round: tiers 2/3 compare marker
    COMMITS, never the working tree, so mid-round commits don't shift a
    pinned emission. Self-consistent under the window reorder itself
    (tests/test_registry_window.py pins this for the active round)."""
    from pipeline_pyspark_etl_imdb_spark.plans import registry

    rows_only = set(registry.ROWS_ONLY)
    last_green, last_seen, max_round = load_history(through_round)
    t = through_round if through_round is not None else max_round
    order = list(registry.QUERIES)

    def signal_round(name: str) -> int:
        if name in rows_only:
            return last_seen.get(name, 0)
        return last_green.get(name, 0)

    never = [n for n in order if n not in rows_only and signal_round(n) == 0]
    changed = [
        n
        for n in order
        if n not in never
        and signal_round(n) < t
        and query_changed(n, signal_round(n), t)
    ]
    key = lambda n: (signal_round(n), order.index(n))  # noqa: E731
    promoted = sorted(changed, key=key)
    rest = sorted(
        (n for n in order if n not in never and n not in set(changed)), key=key
    )
    return (never + promoted + rest)[:50]


def main() -> None:
    from pipeline_pyspark_etl_imdb_spark.plans.registry import QUERIES, ROWS_ONLY

    rows_only = set(ROWS_ONLY)
    last_green, last_seen, max_round = load_history()
    order = list(QUERIES)  # registry order = tie-break

    def signal_round(name: str) -> int:
        if name in rows_only:
            return last_seen.get(name, 0)
        return last_green.get(name, 0)

    proposal = propose_window()

    if "--window-only" not in sys.argv:
        print(f"registry: {len(order)} queries ({len(rows_only)} rows-only); "
              f"records through r{max_round}")
        by_round: dict[int, int] = {}
        for n in order:
            by_round[signal_round(n)] = by_round.get(signal_round(n), 0) + 1
        for rnd in sorted(by_round):
            label = "NEVER" if rnd == 0 else f"r{rnd}"
            print(f"  last signal {label}: {by_round[rnd]} queries")
        stalest = max_round - min(
            (signal_round(n) for n in order if signal_round(n)), default=max_round
        )
        print(f"  max rounds-since-signal (excl. never): {stalest}")
        never = [
            n for n in order if n not in rows_only and signal_round(n) == 0
        ]
        if never:
            print(f"  NEVER-GREEN oracle-backed (visibility debt): {never}")
        print()
    print(f"# proposed r{max_round + 1} window (changed-then-staleness-ordered)")
    print("_PROPOSED_WINDOW: tuple[str, ...] = (")
    for n in proposal:
        sig = signal_round(n)
        tag = "rows-only, last seen" if n in rows_only else "last green"
        sig_s = "never" if sig == 0 else f"r{sig}"
        chg = (
            "; CHANGED since"
            if sig and sig < max_round and query_changed(n, sig, max_round)
            else ""
        )
        print(f'    "{n}",  # {tag} {sig_s}{chg}')
    print(")")


if __name__ == "__main__":
    main()
