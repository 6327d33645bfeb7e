"""README full-cardinality claims must match the committed FULLSCALE
artifact (VERDICT r4 #1: the r4 README claimed a 1623+555-pair sweep while
the directory held 662 pairs of one dataset — this test makes that class of
drift impossible to commit silently)."""

import csv
import glob
import json
import os
import re

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

THREEDMATCH_SPLIT = {
    "7-scenes-redkitchen": 506,
    "sun3d-home_at-home_at_scan1_2013_jan_1": 156,
    "sun3d-home_md-home_md_scan9_2012_sep_30": 208,
    "sun3d-hotel_uc-scan3": 226,
    "sun3d-hotel_umd-maryland_hotel1": 104,
    "sun3d-hotel_umd-maryland_hotel3": 54,
    "sun3d-mit_76_studyroom-76-1studyroom2": 292,
    "sun3d-mit_lab_hj-lab_hj_tea_nov_2_2012_scan1_erika": 77,
}


@pytest.fixture(scope="module")
def artifact_dir():
    dirs = sorted(
        glob.glob(os.path.join(ROOT, "FULLSCALE_r*")),
        key=lambda p: int(re.search(r"_r0*(\d+)", os.path.basename(p)).group(1)),
    )
    if not dirs:
        pytest.skip("no committed FULLSCALE artifact")
    return dirs[-1]


@pytest.fixture(scope="module")
def summary(artifact_dir):
    path = os.path.join(artifact_dir, "summary.json")
    assert os.path.exists(path), (
        f"{artifact_dir} has no summary.json — an incomplete sweep must "
        "not be committed as the FULLSCALE artifact"
    )
    with open(path) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def readme():
    with open(os.path.join(ROOT, "README.md")) as f:
        return f.read()


class TestArtifactComplete:
    def test_both_datasets_at_full_cardinality(self, summary):
        assert summary["3dmatch"]["pairs"] == 1623
        assert summary["3dmatch"]["pairs_expected"] == 1623
        assert summary["kitti"]["pairs"] == 555
        assert summary["kitti"]["pairs_expected"] == 555

    def test_scene_csvs_back_the_summary(self, artifact_dir, summary):
        """Every claimed pair exists as a CSV row; per-scene CSV row counts
        sum to the dataset totals (the summary alone could lie)."""
        for scene, want in THREEDMATCH_SPLIT.items():
            path = os.path.join(artifact_dir, "3dmatch", f"{scene}_fpfh_0.csv")
            with open(path) as f:
                rows = list(csv.DictReader(f))
            assert len(rows) == want, f"{scene}: {len(rows)} rows != {want}"
        kitti_rows = 0
        for path in glob.glob(
            os.path.join(artifact_dir, "kitti", "kitti_seq*_fpfh_0.csv")
        ):
            with open(path) as f:
                kitti_rows += len(list(csv.DictReader(f)))
        assert kitti_rows == 555

    def test_recall_recomputes_from_rows(self, artifact_dir, summary):
        """The summary's recall must equal the per-row Success fraction."""
        for ds in ("3dmatch", "kitti"):
            succ = total = 0
            for path in glob.glob(
                os.path.join(artifact_dir, ds, "*_fpfh_0.csv")
            ):
                with open(path) as f:
                    for row in csv.DictReader(f):
                        total += 1
                        succ += row["Success"] == "1"
            assert total == summary[ds]["pairs"]
            assert succ / total == pytest.approx(
                summary[ds]["recall"], abs=5e-4
            )

    def test_metas_match_protocol(self, artifact_dir):
        """Scene sidecars must record the reference's known-scale protocol:
        estimate_scaling False (main.cc:319) and the full success gate."""
        metas = glob.glob(
            os.path.join(artifact_dir, "*", "*_fpfh_0.csv.meta.json")
        )
        assert len(metas) == 16
        for path in metas:
            with open(path) as f:
                meta = json.load(f)
            assert "estimate_scaling=False" in meta["fingerprint"]["params"]
            assert meta["fingerprint"]["time_gate"] == "projected-per-retry"


class TestReadmeMatchesFullscale:
    def test_readme_cites_latest_dir(self, artifact_dir, readme):
        assert os.path.basename(artifact_dir) + "/" in readme

    def test_readme_pair_counts(self, readme, summary):
        assert f"**{summary['3dmatch']['pairs']} 3DMatch pairs**" in readme
        assert f"**{summary['kitti']['pairs']} KITTI pairs**" in readme

    def test_readme_recall_claim_is_true(self, readme, summary):
        """The README claims recall 1.0 on every scene iff the artifact
        says so."""
        all_one = all(
            v == 1.0
            for ds in ("3dmatch", "kitti")
            for v in summary[ds]["per_scene_recall"].values()
        )
        claims = "Recall 1.0 on every scene" in readme
        assert claims == all_one, (
            "README's every-scene recall claim and the artifact disagree"
        )

    def test_readme_wall_times(self, readme, summary):
        for ds in ("3dmatch", "kitti"):
            want = f"{summary[ds]['sweep_wall_s']:g} s"
            assert want in readme, (
                f"README should quote the {ds} sweep wall time {want}"
            )
