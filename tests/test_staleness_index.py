"""Unit tests for the change-aware rotation's static index (staleness.py).

The git-pinned tests in test_registry_window.py cover real history; these
cover the RESOLUTION MECHANICS on synthetic sources, so a refactor that
breaks alias handling, constant nodes, or reach BFS fails by name instead
of silently mis-rotating the driver window."""

import staleness
from staleness import TOPLEVEL, _RevIndex

OPS_TEXT = '''
from pipeline_pyspark_etl_imdb_spark.operators.util import helper

STOPWORDS = ("a", "the")
_PRIVATE = 3

def tokens(df):
    return helper(df, STOPWORDS)

def unrelated(df):
    return df
'''

OPS_UTIL = '''
def helper(df, stop):
    return df

def other_helper(df):
    return df
'''

REGISTRY = '''
from pipeline_pyspark_etl_imdb_spark.operators import text as text_ops

QUERIES = {}

def _wrapped(spark, sf_dir):
    return text_ops.tokens(spark)

QUERIES["uses_tokens"] = _wrapped
QUERIES["uses_lambda"] = lambda s, d: text_ops.unrelated(s)
'''


def _index(text_src=OPS_TEXT, util_src=OPS_UTIL, reg_src=REGISTRY):
    return _RevIndex(
        "synthetic",
        sources={
            "operators/text.py": text_src,
            "operators/util.py": util_src,
            "plans/registry.py": reg_src,
        },
    )


def test_symbol_import_and_module_alias_resolve():
    idx = _index()
    # registry wrapper: text_ops.tokens via module alias
    assert idx.resolve("plans.registry", ("text_ops", "tokens")) == (
        "operators.text",
        "tokens",
    )
    # text.py: bare `helper` via from-import symbol
    assert idx.resolve("operators.text", (None, "helper")) == (
        "operators.util",
        "helper",
    )
    # text.py: bare module constant resolves to its OWN node
    assert idx.resolve("operators.text", (None, "STOPWORDS")) == (
        "operators.text",
        "STOPWORDS",
    )
    # unknown attr of a known module falls back to its toplevel
    assert idx.resolve("plans.registry", ("text_ops", "nonexistent")) == (
        "operators.text",
        TOPLEVEL,
    )
    # external names resolve to nothing
    assert idx.resolve("operators.text", (None, "print")) is None


def test_reach_walks_cross_module_and_constants():
    idx = _index()
    reach = idx.reach({("operators.text", "tokens")})
    assert ("operators.util", "helper") in reach
    assert ("operators.text", "STOPWORDS") in reach
    # functions nobody on the path references stay out
    assert ("operators.text", "unrelated") not in reach
    assert ("operators.util", "other_helper") not in reach


def test_changed_function_vs_cosmetic_changes():
    a = _index()
    # body change in the REACHED dependency
    b = _index(util_src=OPS_UTIL.replace("return df", "return df.cache()", 1))
    reach = a.reach({("operators.text", "tokens")})
    changed = [
        f"{m}.{n}"
        for m, n in sorted(reach)
        if a.dumps[m].get(n) != b.dumps[m].get(n)
    ]
    assert changed == ["operators.util.helper"]
    # constant change is per-constant, not whole-module
    c = _index(text_src=OPS_TEXT.replace('("a", "the")', '("a",)'))
    changed_c = [
        f"{m}.{n}"
        for m, n in sorted(reach)
        if a.dumps[m].get(n) != c.dumps[m].get(n)
    ]
    assert changed_c == ["operators.text.STOPWORDS"]
    # an UNRELATED constant changing must not touch the reach set
    d = _index(text_src=OPS_TEXT.replace("_PRIVATE = 3", "_PRIVATE = 4"))
    assert all(
        a.dumps[m].get(n) == d.dumps[m].get(n) for m, n in reach
    )


def test_docstring_and_import_churn_do_not_change_toplevel():
    a = _index()
    b = _index(
        util_src='"""new module docstring"""\n' + OPS_UTIL,
    )
    assert a.dumps["operators.util"][TOPLEVEL] == b.dumps["operators.util"][TOPLEVEL]


def test_rotation_metadata_is_excluded_from_registry_nodes():
    a = _index()
    b = _index(
        reg_src=REGISTRY + '\nQUERIES["extra"] = _wrapped\n_R99_WINDOW = ("x",)\n'
    )
    # adding a QUERIES[...] assignment or a window tuple must not change
    # the registry toplevel pseudo-node
    assert (
        a.dumps["plans.registry"][TOPLEVEL]
        == b.dumps["plans.registry"][TOPLEVEL]
    )


def test_function_local_imports_feed_the_alias_map():
    src = '''
def late(df):
    from pipeline_pyspark_etl_imdb_spark.operators.util import other_helper
    return other_helper(df)
'''
    idx = _index(text_src=src)
    reach = idx.reach({("operators.text", "late")})
    assert ("operators.util", "other_helper") in reach


def test_round_markers_exist_for_every_recorded_round():
    """Fail-loud invariant: each CORRECTNESS record round must have its
    marker commit (the change-aware tiers depend on it)."""
    _, _, max_round = staleness.load_history()
    markers = staleness._round_markers()
    missing = [r for r in range(1, max_round + 1) if r not in markers]
    assert not missing, f"rounds without a marker commit: {missing}"
