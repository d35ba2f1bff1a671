"""CLI surface parity: every argparse flag the reference exposes must
exist on the corresponding sequoia_tpu CLI (superset allowed).

This is a static-source gate (regex over ``add_argument`` calls) so it
needs no imports of the reference's modules — it holds even for the
reference files that are shipped-broken (SURVEY.md §7.5).

Reference files: src/main.py, src/he2rna.py, src/pretrain_gtex.py,
pre_processing/{patch_gen_hdf5,compute_features_hdf5,kmean_features}.py,
evaluation/predict_independent_dataset.py,
spatial_vis/{visualize,get_emd}.py.
"""

import os
import re

import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PAIRS = [
    ("src/main.py", "sequoia_tpu/cli/main.py"),
    ("src/he2rna.py", "sequoia_tpu/cli/he2rna.py"),
    ("src/pretrain_gtex.py", "sequoia_tpu/cli/pretrain_gtex.py"),
    ("pre_processing/patch_gen_hdf5.py", "sequoia_tpu/cli/patch_gen.py"),
    ("pre_processing/compute_features_hdf5.py",
     "sequoia_tpu/cli/compute_features.py"),
    ("pre_processing/kmean_features.py", "sequoia_tpu/cli/kmean_features.py"),
    ("evaluation/predict_independent_dataset.py",
     "sequoia_tpu/cli/predict_independent.py"),
    ("spatial_vis/visualize.py", "sequoia_tpu/cli/visualize.py"),
    ("spatial_vis/get_emd.py", "sequoia_tpu/cli/get_emd.py"),
]

FLAG_RE = re.compile(r"add_argument\(\s*[\"'](--?[\w-]+)")


def flags_of(path: str) -> set[str]:
    with open(path) as f:
        return set(FLAG_RE.findall(f.read()))


@pytest.mark.parametrize("ref_rel,our_rel", PAIRS,
                         ids=[p[0] for p in PAIRS])
def test_our_cli_accepts_every_reference_flag(ref_rel, our_rel):
    ref_path = os.path.join(REF, ref_rel)
    if not os.path.exists(ref_path):
        pytest.skip(f"reference checkout lacks {ref_rel}")
    ref_flags = flags_of(ref_path)
    assert ref_flags, f"regex found no flags in {ref_rel} (pattern drift?)"
    ours = flags_of(os.path.join(REPO, our_rel))
    missing = ref_flags - ours
    assert not missing, (
        f"{our_rel} is missing reference flags {sorted(missing)} "
        f"(reference {ref_rel})")
