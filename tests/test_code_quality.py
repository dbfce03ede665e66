"""Run the module-docstring linter over the library tree.

ref: torchrec/modules/tests/test_code_quality.py — the reference CI runs
its AST linter over the module tree; same meta-test here.
"""

import pathlib

from torchrec_tpu.linter import linter_one_file

PKG = pathlib.Path(__file__).resolve().parent.parent / "torchrec_tpu"


def test_module_docstrings_clean():
    issues = []
    for path in sorted(PKG.rglob("*.py")):
        issues.extend(linter_one_file(str(path)))
    assert not issues, "\n".join(issues)


def test_linter_flags_missing_docstring(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text(
        "import flax.linen as nn\n"
        "class NoDoc(nn.Module):\n"
        "    def __call__(self, x):\n"
        "        return x\n"
    )
    issues = linter_one_file(str(bad))
    assert len(issues) == 1 and "missing class docstring" in issues[0]


def test_linter_flags_undocumented_args(tmp_path):
    bad = tmp_path / "bad2.py"
    bad.write_text(
        "import flax.linen as nn\n"
        "class HasDoc(nn.Module):\n"
        "    '''does things.'''\n"
        "    def __call__(self, alpha_x, beta_y):\n"
        "        return alpha_x + beta_y\n"
    )
    issues = linter_one_file(str(bad))
    assert len(issues) == 1 and "undocumented" in issues[0]
