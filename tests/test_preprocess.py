"""S0 preprocessing: BIDS discovery/parsing logic (no MNE required)."""

import json

import numpy as np
import pytest

from manifold_flow_tpu.pipeline import preprocess


@pytest.fixture
def bids_subject(tmp_path):
    subj = tmp_path / "sub-test01"
    ieeg = subj / "ses-1" / "ieeg"
    ieeg.mkdir(parents=True)
    for run in ("021448", "031516"):
        stem = f"sub-test01_ses-1_task-SPESclin_run-{run}"
        (ieeg / f"{stem}_ieeg.vhdr").write_text("")
        (ieeg / f"{stem}_ieeg.json").write_text(
            json.dumps({"PowerLineFrequency": 50,
                        "SamplingFrequency": 2048}))
        (ieeg / f"{stem}_channels.tsv").write_text(
            "name\ttype\tstatus\tstatus_description\n"
            "G1\tECOG\tgood\tincluded\n"
            "G2\tECOG\tbad\tincluded\n"
            "G3\tECOG\tgood\texcluded\n"
            "EKG\tECG\tgood\tincluded\n"
            "G4\tECOG\tgood\tincluded\n")
        (ieeg / f"{stem}_events.tsv").write_text(
            "onset\tsample_start\ttrial_type\telectrical_stimulation_site\n"
            "1.0\t2048\telectrical_stimulation\tG1-G2\n"
            "2.0\t4096\tartifact\tn/a\n"
            "3.0\t6144\telectrical_stimulation\tG3-G4\n"
            "4.0\t8192\telectrical_stimulation\tG1-G2\n")
    return subj


def test_discover_runs(bids_subject):
    runs = preprocess.discover_runs(bids_subject)
    assert [r.run for r in runs] == ["021448", "031516"]
    r = runs[0]
    assert r.subject == "sub-test01"
    assert r.session == "ses-1"
    assert r.vhdr.exists()
    assert r.stem == "sub-test01_ses-1_task-SPESclin_run-021448"


def test_good_ecog_channels(bids_subject):
    runs = preprocess.discover_runs(bids_subject)
    # ECOG & good & included only (S0_preprocess.py:65-77).
    assert preprocess.good_ecog_channels(runs[0].channels_tsv) == ["G1", "G4"]


def test_stimulation_events(bids_subject):
    runs = preprocess.discover_runs(bids_subject)
    events, event_id = preprocess.stimulation_events(runs[0].events_tsv)
    # Sites coded in first-appearance order; non-stimulation rows dropped.
    assert event_id == {"G1-G2": 0, "G3-G4": 1}
    np.testing.assert_array_equal(
        events, [[2048, 0, 0], [6144, 0, 1], [8192, 0, 0]])


def test_power_line_frequency(bids_subject):
    runs = preprocess.discover_runs(bids_subject)
    assert preprocess.power_line_frequency(runs[0].sidecar_json, 60.0) == 50.0


def test_missing_session_raises(tmp_path):
    empty = tmp_path / "sub-empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        preprocess.discover_runs(empty)
