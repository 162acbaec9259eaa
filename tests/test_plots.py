"""Plot layer: generates all five figures from the REFERENCE paper_plots
JSONs (the de-facto published numbers) without error."""
import os

import matplotlib
matplotlib.use("Agg")

import pytest

from pcaudio.eval.plots import generate_all

REF_PLOTS = "/root/reference/Code/paper_plots"


@pytest.mark.skipif(not os.path.isdir(REF_PLOTS), reason="reference not mounted")
def test_generate_all_from_reference_jsons(tmp_path):
    outs = generate_all(REF_PLOTS, str(tmp_path))
    assert len(outs) == 5
    for f in outs:
        assert os.path.exists(f) and os.path.getsize(f) > 1000
