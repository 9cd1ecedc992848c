"""Function-level change detection for the driver sweep's ordering.

``__spark_entry__.queries()`` fronts queries whose CODE changed since
their last green driver verdict, so regressions surface in the same
round. File-level granularity (the r5 implementation) over-marks badly:
registering a NEW operator in ``similarity.py`` marked every similarity
query changed, and a one-line fallback tweak in ``functions/skew.py``
marked all ~40 ``grouped_topk`` consumers — crowding the
stalest-verdict refresh (r6 verdict item 4) out of the sweep's
wall-clock budget.

This module fingerprints each builder at FUNCTION granularity: the
builder's own ``FunctionDef`` (decorators included — so the registered
oracle SQL and description participate) plus the transitive closure of
module-level definitions it references, followed across
package-internal imports. Docstrings are stripped before dumping, so
comment/doc wording never marks anything. A query re-runs early iff
its fingerprint differs between the base commit and the working tree.

Deliberately conservative at every resolution gap: a name that cannot
be resolved (builtins, pyspark, dynamic tricks) is skipped — it cannot
change inside this repo; any parse/lookup FAILURE yields fingerprint
``None``, which callers treat as "changed". Wildcard imports mark the
whole source module as a dependency.

Pure functions over ``{relfile: source}`` snapshots — no git, no
filesystem — so the base-commit and working-tree views use the same
code path and tests can feed synthetic trees.
"""

from __future__ import annotations

import ast
import hashlib

PKG = "full_stack_big_data_spark"


def _strip_docstrings(tree: ast.AST) -> ast.AST:
    for node in ast.walk(tree):
        body = getattr(node, "body", None)
        if (isinstance(body, list) and body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)):
            node.body = body[1:] or [ast.Pass()]
    return tree


def _module_file(mod: str, sources: dict[str, str]) -> str | None:
    rel = mod.replace(".", "/")
    for cand in (rel + ".py", rel + "/__init__.py"):
        if cand in sources:
            return cand
    return None


def _resolve_import(stmt: ast.stmt, pkg_parts: list[str],
                    sources: dict[str, str]
                    ) -> tuple[dict[str, tuple[str, str, str | None]], list[str]]:
    """Resolve one Import/ImportFrom into (local name → target, star
    deps). Targets are ("name", file, orig) or ("module", file, None);
    non-package imports resolve to nothing."""
    imports: dict[str, tuple[str, str, str | None]] = {}
    stars: list[str] = []
    if isinstance(stmt, ast.Import):
        for a in stmt.names:
            if a.name.startswith(PKG):
                f = _module_file(a.name, sources)
                if f:
                    local = (a.asname or a.name.split(".")[0])
                    imports[local] = ("module", f, None)
    elif isinstance(stmt, ast.ImportFrom):
        mod = stmt.module or ""
        if stmt.level:
            base_parts = pkg_parts[:len(pkg_parts) - stmt.level + 1]
            mod = ".".join(base_parts + ([stmt.module] if stmt.module else []))
        if not mod.startswith(PKG):
            return imports, stars
        for a in stmt.names:
            if a.name == "*":
                f = _module_file(mod, sources)
                if f:
                    stars.append(f)
                continue
            # `from .x import y`: y is a name in module x, or the
            # submodule x/y.py itself
            f = _module_file(mod, sources)
            sub = _module_file(f"{mod}.{a.name}", sources)
            local = a.asname or a.name
            if sub:
                imports[local] = ("module", sub, None)
            elif f:
                imports[local] = ("name", f, a.name)
    return imports, stars


class _Module:
    """Parsed view of one file: name → module-level definition nodes,
    name → import target, plus the statements that belong to no name
    (expression side effects at import time)."""

    def __init__(self, relfile: str, source: str, sources: dict[str, str]):
        self.relfile = relfile
        tree = _strip_docstrings(ast.parse(source))
        self.defs: dict[str, list[ast.AST]] = {}
        # local name → ("name", file, orig_name) | ("module", file, None)
        self.imports: dict[str, tuple[str, str, str | None]] = {}
        self.star_deps: list[str] = []   # files pulled in wholesale
        self.loose: list[ast.AST] = []   # anonymous module-level statements
        self.pkg_parts = (relfile.rsplit("/", 1)[0].split("/")
                          if "/" in relfile else [])

        def visit(stmt: ast.stmt) -> None:
            if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef,
                                 ast.ClassDef)):
                self.defs.setdefault(stmt.name, []).append(stmt)
            elif isinstance(stmt, ast.Assign):
                for tgt in stmt.targets:
                    for name in _target_names(tgt):
                        self.defs.setdefault(name, []).append(stmt)
            elif isinstance(stmt, (ast.AnnAssign, ast.AugAssign)):
                for name in _target_names(stmt.target):
                    self.defs.setdefault(name, []).append(stmt)
            elif isinstance(stmt, (ast.Import, ast.ImportFrom)):
                imp, stars = _resolve_import(stmt, self.pkg_parts, sources)
                self.imports.update(imp)
                self.star_deps.extend(stars)
            elif isinstance(stmt, (ast.If, ast.Try, ast.With, ast.For,
                                   ast.While)):
                # The compound statement's guard/context expressions run
                # at import time just like a loose statement — hash them
                # into <loose> so editing a module-level `if FLAG:` test
                # or `with open(p):` context expr invalidates
                # fingerprints (r8 ADVICE; stmt children alone miss it).
                self.loose.extend(_guard_exprs(stmt))
                for child in ast.iter_child_nodes(stmt):
                    if isinstance(child, ast.stmt):
                        visit(child)
                # ast.ExceptHandler is NOT an ast.stmt, so the recursion
                # above skips handler BODIES — yet a module-level
                # `except ImportError: np = None` fallback executes at
                # import time on the exception path, and editing it must
                # invalidate fingerprints (r9 ADVICE; the r8 fix hashed
                # only the handler TYPES).
                if isinstance(stmt, ast.Try):
                    for handler in stmt.handlers:
                        for child in handler.body:
                            visit(child)
            else:
                self.loose.append(stmt)

        for stmt in tree.body:
            visit(stmt)


def _guard_exprs(stmt: ast.stmt) -> list[ast.AST]:
    """The expressions a module-level compound statement evaluates
    before/around its body: If/While tests, For target+iter, With
    items, Try handler types. These execute at import time, so they
    must participate in the <loose> fingerprint."""
    if isinstance(stmt, (ast.If, ast.While)):
        return [stmt.test]
    if isinstance(stmt, (ast.For, ast.AsyncFor)):
        return [stmt.target, stmt.iter]
    if isinstance(stmt, (ast.With, ast.AsyncWith)):
        out: list[ast.AST] = []
        for item in stmt.items:
            out.append(item.context_expr)
            if item.optional_vars is not None:
                out.append(item.optional_vars)
        return out
    if isinstance(stmt, ast.Try):
        return [h.type for h in stmt.handlers if h.type is not None]
    return []


def _target_names(tgt: ast.expr) -> list[str]:
    if isinstance(tgt, ast.Name):
        return [tgt.id]
    if isinstance(tgt, (ast.Tuple, ast.List)):
        out: list[str] = []
        for el in tgt.elts:
            out.extend(_target_names(el))
        return out
    return []


def _referenced_names(node: ast.AST) -> tuple[set[str], set[tuple[str, str]]]:
    """(bare names loaded, (module_alias, attr) pairs) inside ``node``."""
    names: set[str] = set()
    attrs: set[tuple[str, str]] = set()
    for n in ast.walk(node):
        if isinstance(n, ast.Name):
            names.add(n.id)
        elif isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
            attrs.add((n.value.id, n.attr))
    return names, attrs


class _Resolver:
    def __init__(self, sources: dict[str, str]):
        self.sources = sources
        self._mods: dict[str, _Module] = {}

    def module(self, relfile: str) -> _Module:
        if relfile not in self._mods:
            self._mods[relfile] = _Module(relfile, self.sources[relfile],
                                          self.sources)
        return self._mods[relfile]

    def closure(self, relfile: str, root_name: str) -> set[tuple[str, str, str]]:
        """Transitive (file, name, dump) triples reachable from
        ``root_name`` defined in ``relfile``."""
        out: set[tuple[str, str, str]] = set()
        seen: set[tuple[str, str]] = set()
        whole_files: set[str] = set()
        visited_files: set[str] = set()
        stack: list[tuple[str, str]] = [(relfile, root_name)]
        while stack:
            f, name = stack.pop()
            if (f, name) in seen:
                continue
            seen.add((f, name))
            mod = self.module(f)
            visited_files.add(f)
            if name in mod.defs:
                for node in mod.defs[name]:
                    out.add((f, name, ast.dump(node)))
                    names, attrs = _referenced_names(node)
                    # Function-LOCAL imports (`from ..functions.skew
                    # import grouped_topk` inside a builder body) bind
                    # names the module map can't see — resolve them
                    # here; they shadow module-level bindings.
                    local_imports: dict[str, tuple[str, str, str | None]] = {}
                    for sub in ast.walk(node):
                        if isinstance(sub, (ast.Import, ast.ImportFrom)):
                            imp, stars = _resolve_import(
                                sub, mod.pkg_parts, self.sources)
                            local_imports.update(imp)
                            whole_files.update(stars)
                    for ref in names:
                        tgt = local_imports.get(ref)
                        if tgt is None:
                            stack.append((f, ref))
                        elif tgt[0] == "name":
                            stack.append((tgt[1], tgt[2]))
                        else:
                            whole_files.add(tgt[1])
                    for alias, attr in attrs:
                        tgt = local_imports.get(alias) or mod.imports.get(alias)
                        if tgt and tgt[0] == "module":
                            stack.append((tgt[1], attr))
            elif name in mod.imports:
                kind, tfile, orig = mod.imports[name]
                if kind == "name":
                    stack.append((tfile, orig))
                else:  # module import referenced bare (rare): whole file
                    whole_files.add(tfile)
            elif any(True for _ in mod.star_deps):
                # unresolved locally and the module has star imports: the
                # name may come from any of them — depend on them whole
                whole_files.update(mod.star_deps)
            # else: builtin / external — cannot change in this repo
        # Anonymous module-level statements (bare calls, dict/list
        # mutations at import time) run when the module is imported and
        # can alter the behavior of every name the module exports, so
        # they belong to the closure of every root whose walk touched
        # the file. Without this, a module-level side-effect edit would
        # leave fingerprints unchanged — anti-conservative.
        for f in visited_files:
            loose = self.module(f).loose
            if loose:
                out.add((f, "<loose>",
                         "\n".join(ast.dump(s) for s in loose)))
        for f in whole_files:
            out.add((f, "<module>", self.sources[f]))
        return out


def builder_fingerprints(sources: dict[str, str],
                         roots: dict[str, tuple[str, str]]) -> dict[str, str | None]:
    """Fingerprint each query's builder closure.

    ``sources``: repo-relative file → source text (the full package).
    ``roots``: query name → (relfile, function_name).
    Returns query → sha256 hex (or None when anything failed — callers
    must treat None as "changed").
    """
    res = _Resolver(sources)
    out: dict[str, str | None] = {}
    for q, (relfile, fn) in roots.items():
        try:
            if relfile not in sources:
                out[q] = None
                continue
            triples = res.closure(relfile, fn)
            if not any(f == relfile and n == fn for f, n, _ in triples):
                out[q] = None          # builder def itself not found
                continue
            h = hashlib.sha256()
            for t in sorted(triples):
                h.update(repr(t).encode())
            out[q] = h.hexdigest()
        except Exception:
            out[q] = None
    return out
