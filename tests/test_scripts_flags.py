"""scripts/*.sh lint: every `--flag` a driver script passes must exist on
the CLI module it invokes (the reference shipped two stale scripts —
SURVEY.md §2.1 'Driver scripts'; this gate keeps ours from rotting)."""

import glob
import importlib
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "scripts", "*.sh")))

MOD_RE = re.compile(r"python3? -m (sequoia_tpu\.cli\.\w+)")
FLAG_RE = re.compile(r"(--[\w-]+)")


@pytest.mark.parametrize("script", SCRIPTS,
                         ids=[os.path.basename(s) for s in SCRIPTS])
def test_script_flags_exist_on_cli(script):
    with open(script) as f:
        # flags mentioned in comments (e.g. "# --weights: path to ...")
        # are documentation, not invocation arguments
        text = "\n".join(ln for ln in f.read().splitlines()
                         if not ln.lstrip().startswith("#"))
    mods = MOD_RE.findall(text)
    assert mods, f"{script} invokes no sequoia_tpu.cli module"
    used = set(FLAG_RE.findall(text))
    known: set[str] = set()
    for mod_name in set(mods):
        mod = importlib.import_module(mod_name)
        parser = mod.build_parser()
        for action in parser._actions:
            known.update(o for o in action.option_strings
                         if o.startswith("--"))
    missing = used - known
    assert not missing, (f"{os.path.basename(script)} passes flags "
                         f"{sorted(missing)} unknown to {sorted(set(mods))}")
