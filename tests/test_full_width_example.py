"""Opt-in full-width example run (VERDICT r2 item 8; r4 item 5 extended it
to ALL FIVE BASELINE.md configs).

Executes ``tools/run_example_pipeline.sh`` with ``FULL=1``: the REAL
20,820-gene list imported from the reference checkout drives every stage —
tiling, resnet AND uni features, k-means, 2-fold CV training, all_genes.csv
evaluation, HE2RNA CV, fold-ensemble independent inference, GTEx pretrain ->
head-swap fine-tune -> spatial expression maps, and serving — at reference
width on CPU.

~45-60 min on the sandbox host, so it is gated behind an env opt-in on top
of the slow marker:

    SEQUOIA_FULL_EXAMPLE=1 python -m pytest tests/test_full_width_example.py -m slow
"""

import os
import subprocess

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("SEQUOIA_FULL_EXAMPLE") != "1",
                    reason="set SEQUOIA_FULL_EXAMPLE=1 to run (~35 min)")
@pytest.mark.skipif(not os.path.exists("/root/reference/examples/gene_list.csv"),
                    reason="reference checkout not present")
def test_full_width_example_pipeline(tmp_path):
    out = str(tmp_path / "full")
    env = dict(os.environ, FULL="1", SEQUOIA_JAX_PLATFORM="cpu")
    r = subprocess.run(
        ["bash", os.path.join(REPO, "tools", "run_example_pipeline.sh"), out],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=7200)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]

    genes = pd.read_csv(os.path.join(out, "gene_list.csv"))
    assert len(genes) == 20820  # the real imported panel, not synthetics

    all_genes = pd.read_csv(os.path.join(out, "results", "all_genes.csv"),
                            index_col=0)
    assert len(all_genes) == 20820
    assert {"pred_real_r", "Steiger_p", "fdr_pearson_p"} <= set(all_genes.columns)

    preds = pd.read_csv(os.path.join(out, "results", "predictions.csv"),
                        index_col=0)
    assert preds.shape == (12, 20820)
    assert list(preds.columns) == [str(g) for g in genes[genes.columns[-1]]]

    # config 3: HE2RNA CV artifacts
    import pickle
    with open(os.path.join(out, "exp_he2rna", "demo", "test_results.pkl"),
              "rb") as f:
        h2r = pickle.load(f)
    assert "split_0" in h2r and len(h2r["genes"]) == 20820

    # config 4: fold-ensemble independent inference over uni features
    with open(os.path.join(out, "results_independent", "ind",
                           "test_results.pkl"), "rb") as f:
        ind = pickle.load(f)
    assert ind["pred"].shape == (12, 20820)
    assert ind["random"].shape == (12, 20820)

    # config 5: GTEx pretrain -> head-swap fine-tune -> eval -> spatial
    ft_genes = pd.read_csv(os.path.join(out, "results_ft", "all_genes.csv"),
                           index_col=0)
    assert len(ft_genes) == 20820
    spatial = pd.read_csv(os.path.join(out, "results_ft", "stride-4.csv"),
                          index_col=0)
    g0 = str(genes[genes.columns[-1]].iloc[0])
    for col in ("xcoord", "ycoord", f"{g0}_0", f"{g0}_1", g0):
        assert col in spatial.columns, col
    assert spatial[g0].notna().sum() > 0
