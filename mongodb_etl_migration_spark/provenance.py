"""Query-implementation hashing: "changed code invalidates its green".

The driver caps how many queries it oracle-checks per round, so the
catalog must enumerate the queries MOST in need of a fresh driver row
first. Hand-maintained green sets rot (round 3 rewrote J9's operator
but its green set membership said "checked"); instead, each query gets
an IMPLEMENTATION HASH covering everything that determines its result:

  * the query function's own source (via inspect.getsource), plus the
    source of any helpers defined alongside it in the queries module
    that it references (recursively);
  * its oracle SQL string (an oracle edit re-runs the check too);
  * the full file contents of every package module the function
    references — resolved from the function's code-object names, then
    expanded TRANSITIVELY over the package's import graph, so a query
    whose operator calls ``functions.scalars`` is invalidated by a
    scalars edit even though the query never imports scalars itself.

``scripts/update_green_hashes.py`` snapshots these hashes for every
query at the commit its latest green driver row actually tested
(GREEN_HASHES.json); ``__spark_entry__.queries()`` enumerates
hash-mismatched / never-green queries first. No hand-maintained sets.
"""

from __future__ import annotations

import hashlib
import inspect
import re
import types
from pathlib import Path

_PKG = "mongodb_etl_migration_spark"
_IMPORT_RE = re.compile(
    rf"^\s*(?:from\s+({_PKG}(?:\.\w+)*)\s+import\s+([\w, ()*]+)"
    rf"|import\s+({_PKG}(?:\.\w+)*))",
    re.M,
)


def package_files(pkg_root: Path) -> dict[str, Path]:
    """Module name → file path for every .py in the package tree."""
    out: dict[str, Path] = {}
    for p in sorted(pkg_root.rglob("*.py")):
        rel = p.relative_to(pkg_root.parent)
        mod = ".".join(rel.with_suffix("").parts)
        if mod.endswith(".__init__"):
            mod = mod[: -len(".__init__")]
        out[mod] = p
    return out


def import_graph(files: dict[str, Path]) -> dict[str, set[str]]:
    """module → package modules it imports (textual scan; ``from pkg.x
    import name`` maps to pkg.x, ``from pkg import x`` maps to pkg.x
    when x is a module, else pkg)."""
    graph: dict[str, set[str]] = {m: set() for m in files}
    for mod, path in files.items():
        text = path.read_text()
        for m in _IMPORT_RE.finditer(text):
            frm, names, plain = m.group(1), m.group(2), m.group(3)
            target = frm or plain
            if target in files:
                graph[mod].add(target)
            if frm and names:
                for n in re.split(r"[,\s()]+", names):
                    sub = f"{frm}.{n}"
                    if n and sub in files:
                        graph[mod].add(sub)
    return graph


def _closure(mods: set[str], graph: dict[str, set[str]]) -> set[str]:
    seen, stack = set(), list(mods)
    while stack:
        m = stack.pop()
        if m in seen:
            continue
        seen.add(m)
        stack.extend(graph.get(m, ()))
    return seen


def _code_names(code: types.CodeType) -> set[str]:
    """Global names referenced by a code object, including nested
    lambdas/comprehensions (their code objects live in co_consts)."""
    names = set(code.co_names)
    for const in code.co_consts:
        if isinstance(const, types.CodeType):
            names |= _code_names(const)
    return names


def _fn_deps(
    fn, queries_mod_name: str
) -> tuple[set[str], list[str], list[str]]:
    """(package modules referenced, queries-module source snippets,
    function-granular self snippets) for ``fn``.

    Globals that are package modules or objects from package modules
    contribute their module (the full/narrow closure); callables
    defined in the queries module itself (decorators, local helpers)
    contribute their SOURCE instead of the whole queries file, so
    editing one query never invalidates the other hundred. Helper
    expansion is recursive.

    The SELF snippets go further: every package FUNCTION the query
    transitively calls — across module boundaries, including functions
    reached as ``module.attr`` — contributes its own source, and
    package classes contribute their class source. Module-level
    constants are NOT captured at this granularity (they have no
    ``__module__``); the module-file-granular narrow hash remains the
    tier that catches constant edits. Objects from _UBIQUITOUS infra
    modules (Catalog et al.) are excluded from self snippets for the
    same reason those modules are excluded from the narrow closure —
    an infra edit must not reclassify all 100+ queries as changed.
    """
    mods: set[str] = set()
    snippets: list[str] = []
    self_snippets: list[str] = []
    visited: set[tuple[str, str]] = set()

    def src(obj) -> str:
        try:
            return inspect.getsource(obj)
        except (OSError, TypeError):
            return repr(obj)

    def visit_class(cls: type) -> None:
        key = (cls.__module__, cls.__qualname__)
        if key in visited:
            return
        visited.add(key)
        self_snippets.append(src(cls))

    def walk(f, top: bool) -> None:
        key = (f.__module__, f.__qualname__)
        if key in visited:
            return
        visited.add(key)
        s = src(f)
        if top:
            snippets.append(s)
        self_snippets.append(s)
        names = _code_names(f.__code__)
        for name in sorted(names):
            g = f.__globals__.get(name)
            if g is None:
                continue
            if isinstance(g, types.ModuleType):
                if g.__name__.startswith(_PKG):
                    mods.add(g.__name__)
                    # function-granular: co_names also carries the
                    # LOAD_ATTR names, so intersect them with the
                    # module's namespace to find module.attr calls.
                    for attr in sorted(names & set(vars(g))):
                        obj = vars(g)[attr]
                        omod = getattr(obj, "__module__", "") or ""
                        if not omod.startswith(_PKG) or omod in _UBIQUITOUS:
                            continue
                        if isinstance(obj, types.FunctionType):
                            walk(obj, False)
                        elif isinstance(obj, type):
                            visit_class(obj)
                continue
            gmod = getattr(g, "__module__", None)
            if not (gmod and gmod.startswith(_PKG)):
                continue
            if gmod == queries_mod_name and isinstance(
                g, types.FunctionType
            ):
                walk(g, top)
            else:
                mods.add(gmod)
                if gmod in _UBIQUITOUS:
                    continue
                if isinstance(g, types.FunctionType):
                    walk(g, False)
                elif isinstance(g, type):
                    visit_class(g)

    walk(fn, True)
    return mods, snippets, self_snippets


# Infra modules in (nearly) every query's closure. An edit here
# honestly invalidates every FULL hash, but ranking all 104 queries
# equally "changed" defeats the driver's per-round check cap — so the
# NARROW hash excludes these, and enumeration puts narrow-mismatched
# queries (their own code/operators changed) ahead of full-only
# mismatches (shared infra changed underneath them).
_UBIQUITOUS = frozenset(
    {_PKG, f"{_PKG}.catalog", f"{_PKG}.session", f"{_PKG}.metrics"}
)


def query_impl_hash(
    fn,
    oracle: str | None,
    files: dict[str, Path],
    graph: dict[str, set[str]],
) -> dict[str, str]:
    """``{"full": ..., "narrow": ..., "self": ...}`` hashes of
    everything that determines a query's result, at three
    granularities: full = module files over the whole import closure;
    narrow = the same minus _UBIQUITOUS infra modules; self =
    function-granular sources of the query's own transitive call
    chain (plus the oracle), so that adding an UNRELATED function to
    a shared operator module does not flag this query as changed."""
    mods, snippets, self_snippets = _fn_deps(fn, fn.__module__)
    closure = _closure(mods, graph)
    out = {}
    for kind, skip in (("full", frozenset()), ("narrow", _UBIQUITOUS)):
        h = hashlib.sha256()
        for s in snippets:
            h.update(s.encode())
        h.update((oracle or "<no-oracle>").encode())
        for mod in sorted(closure - skip):
            p = files.get(mod)
            if p is not None:
                h.update(mod.encode())
                h.update(p.read_bytes())
        out[kind] = h.hexdigest()
    h = hashlib.sha256()
    for s in self_snippets:
        h.update(s.encode())
    h.update((oracle or "<no-oracle>").encode())
    out["self"] = h.hexdigest()
    return out


def catalog_hashes(
    queries: dict, oracles: dict, pkg_root: Path
) -> dict[str, dict[str, str]]:
    """Implementation hashes for every catalog query."""
    files = package_files(pkg_root)
    graph = import_graph(files)
    return {
        name: query_impl_hash(fn, oracles.get(name), files, graph)
        for name, fn in queries.items()
    }
