"""Function-level change detection (engine/changedet.py) — the sweep
ordering's changed-set must mark exactly the builders whose reference
closure changed, so hygiene edits and new sibling operators stop
crowding the stalest-verdict refresh out of the driver budget."""

from __future__ import annotations

from full_stack_big_data_spark.engine.changedet import builder_fingerprints

PKG = "full_stack_big_data_spark"

BASE = {
    f"{PKG}/functions/skew.py": '''
LIMIT = 64

def topk(df, k):
    """helper doc"""
    return (df, k, LIMIT)
''',
    f"{PKG}/operators/alpha.py": f'''
"""module doc"""
from ..functions.skew import topk

SCALE = 10

def q_alpha(spark, sf):
    """alpha doc"""
    return topk(spark, SCALE)

def q_beta(spark, sf):
    return (spark, sf)
''',
    f"{PKG}/operators/gamma.py": '''
def q_gamma(spark, sf):
    from ..functions.skew import topk
    return topk(spark, 5)
''',
}

ROOTS = {
    "q_alpha": (f"{PKG}/operators/alpha.py", "q_alpha"),
    "q_beta": (f"{PKG}/operators/alpha.py", "q_beta"),
    "q_gamma": (f"{PKG}/operators/gamma.py", "q_gamma"),
}


def _edit(files: dict[str, str], path_suffix: str, old: str, new: str):
    out = dict(files)
    key = f"{PKG}/{path_suffix}"
    assert old in out[key], (key, old)
    out[key] = out[key].replace(old, new)
    return out


def test_docstring_and_comment_changes_do_not_mark():
    work = _edit(BASE, "operators/alpha.py", '"""alpha doc"""',
                 '"""totally reworded alpha doc"""')
    work = _edit(work, "functions/skew.py", '"""helper doc"""',
                 '"""new helper wording"""\n    # plus a comment')
    b, w = builder_fingerprints(BASE, ROOTS), builder_fingerprints(work, ROOTS)
    assert b == w and None not in b.values()


def test_new_sibling_operator_marks_nothing_existing():
    work = _edit(BASE, "operators/alpha.py", "def q_beta",
                 "def q_new(spark, sf):\n    return 42\n\ndef q_beta")
    b, w = builder_fingerprints(BASE, ROOTS), builder_fingerprints(work, ROOTS)
    assert b == w


def test_referenced_constant_marks_only_its_referrers():
    work = _edit(BASE, "operators/alpha.py", "SCALE = 10", "SCALE = 99")
    b, w = builder_fingerprints(BASE, ROOTS), builder_fingerprints(work, ROOTS)
    assert w["q_alpha"] != b["q_alpha"]
    assert w["q_beta"] == b["q_beta"]
    assert w["q_gamma"] == b["q_gamma"]


def test_cross_module_dependency_via_module_level_import():
    work = _edit(BASE, "functions/skew.py", "LIMIT = 64", "LIMIT = 128")
    b, w = builder_fingerprints(BASE, ROOTS), builder_fingerprints(work, ROOTS)
    assert w["q_alpha"] != b["q_alpha"]     # topk reads LIMIT
    assert w["q_gamma"] != b["q_gamma"]     # function-local import path
    assert w["q_beta"] == b["q_beta"]


def test_function_local_import_resolved():
    work = _edit(BASE, "functions/skew.py", "return (df, k, LIMIT)",
                 "return (df, k + 1, LIMIT)")
    b, w = builder_fingerprints(BASE, ROOTS), builder_fingerprints(work, ROOTS)
    assert w["q_gamma"] != b["q_gamma"]
    assert w["q_beta"] == b["q_beta"]


def test_module_level_side_effect_marks_the_files_builders():
    # A loose statement (bare call / mutation at import time) runs on
    # import and can change behavior of everything the module defines —
    # it must participate in the fingerprint of every builder whose
    # closure touches that file (r7 ADVICE: _Module.loose was dead).
    base = _edit(BASE, "operators/alpha.py", "SCALE = 10",
                 "SCALE = 10\nprint('side effect v1')")
    work = _edit(BASE, "operators/alpha.py", "SCALE = 10",
                 "SCALE = 10\nprint('side effect v2')")
    b, w = builder_fingerprints(base, ROOTS), builder_fingerprints(work, ROOTS)
    assert w["q_alpha"] != b["q_alpha"]
    assert w["q_beta"] != b["q_beta"]
    assert w["q_gamma"] == b["q_gamma"]   # gamma never touches alpha.py


def test_side_effect_in_imported_module_marks_importers():
    base = _edit(BASE, "functions/skew.py", "LIMIT = 64",
                 "LIMIT = 64\nregistry = []\nregistry.append(1)")
    work = _edit(BASE, "functions/skew.py", "LIMIT = 64",
                 "LIMIT = 64\nregistry = []\nregistry.append(2)")
    b, w = builder_fingerprints(base, ROOTS), builder_fingerprints(work, ROOTS)
    assert w["q_alpha"] != b["q_alpha"]
    assert w["q_gamma"] != b["q_gamma"]
    assert w["q_beta"] == b["q_beta"]     # beta has no skew.py dependency


def test_compound_guard_expr_marks_the_files_builders():
    # A module-level `if FLAG:` test / `with open(p):` context expr
    # executes at import time just like a loose statement; editing the
    # GUARD (not the body) must invalidate fingerprints (r8 ADVICE —
    # only stmt children of compound statements were visited).
    base = _edit(BASE, "operators/alpha.py", "SCALE = 10",
                 "SCALE = 10\nif SCALE > 1:\n    pass")
    work = _edit(BASE, "operators/alpha.py", "SCALE = 10",
                 "SCALE = 10\nif SCALE > 2:\n    pass")
    b, w = builder_fingerprints(base, ROOTS), builder_fingerprints(work, ROOTS)
    assert w["q_alpha"] != b["q_alpha"]
    assert w["q_beta"] != b["q_beta"]
    assert w["q_gamma"] == b["q_gamma"]


def test_with_context_expr_marks_the_files_builders():
    base = _edit(BASE, "functions/skew.py", "LIMIT = 64",
                 "LIMIT = 64\nwith open('/dev/null') as _f:\n    pass")
    work = _edit(BASE, "functions/skew.py", "LIMIT = 64",
                 "LIMIT = 64\nwith open('/dev/zero') as _f:\n    pass")
    b, w = builder_fingerprints(base, ROOTS), builder_fingerprints(work, ROOTS)
    assert w["q_alpha"] != b["q_alpha"]
    assert w["q_gamma"] != b["q_gamma"]
    assert w["q_beta"] == b["q_beta"]


def test_try_handler_body_marks_the_files_builders():
    # A module-level `except ImportError: np = None` fallback executes
    # at import time on the exception path, but ast.ExceptHandler is
    # not an ast.stmt — the child recursion skips it, so editing the
    # handler BODY left fingerprints unchanged (r9 ADVICE; the r8 fix
    # hashed only the handler TYPES).
    base = _edit(BASE, "functions/skew.py", "LIMIT = 64",
                 "LIMIT = 64\ntry:\n    import os as _os\n"
                 "except ImportError:\n    LIMIT = 32")
    work = _edit(BASE, "functions/skew.py", "LIMIT = 64",
                 "LIMIT = 64\ntry:\n    import os as _os\n"
                 "except ImportError:\n    LIMIT = 16")
    b, w = builder_fingerprints(base, ROOTS), builder_fingerprints(work, ROOTS)
    assert w["q_alpha"] != b["q_alpha"]
    assert w["q_gamma"] != b["q_gamma"]
    assert w["q_beta"] == b["q_beta"]


def test_missing_builder_is_none():
    roots = dict(ROOTS, q_ghost=(f"{PKG}/operators/alpha.py", "q_ghost"))
    fps = builder_fingerprints(BASE, roots)
    assert fps["q_ghost"] is None
    assert fps["q_alpha"] is not None
