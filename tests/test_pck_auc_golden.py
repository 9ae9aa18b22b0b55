"""End-to-end synthetic golden validation of the PCK/AUC harness.

The real 3dhp_test/TS*/annot_data.mat blobs are stripped from the reference
mount, so the full-driver diff against the committed H20_K10 CSVs can't run
here. Instead this test fabricates annot+inference payloads with controlled
errors spanning activities, valid-frame masks and the PCK threshold range,
runs `evaluate_3dhp_mat` end-to-end (real .mat files on disk, real CSV
output), and cross-checks EVERY numeric table cell against an independent
literal transcription of the MATLAB pipeline:

    mpii_test_predictions_ori_py.m:29-75  (driver: root-centring, masking)
    mpii_evaluate_errors.m                (sequence/activity tables)
    mpii_compute_3d_pck.m:19-50           (strict-< thresholds, group math)
    mpii_get_pck_auc_joint_groups.m       (8 groups over 14 joints)

The transcription below follows the .m control flow line-for-line and
shares NO code with d3dp_tpu.metrics.pck_auc — a joint-group, masking,
root-centring or threshold regression in the port flips real cells here.
"""

import csv
import os

import numpy as np
import pytest

from d3dp_tpu.metrics.pck_auc import evaluate_3dhp_mat

sio = pytest.importorskip("scipy.io")

N_SEQ, NJ, K = 6, 17, 2


# ---------------------------------------------------------------- oracle
# literal transcription of the MATLAB scripts (1-based indices kept in
# comments); intentionally naive loops, no vectorised shortcuts

ORACLE_GROUPS = [  # mpii_get_pck_auc_joint_groups.m (1-based -> 0-based)
    ("Head", [0]), ("Neck", [1]), ("Shou", [2, 5]), ("Elbow", [3, 6]),
    ("Wrist", [4, 7]), ("Hip", [8, 11]), ("Knee", [9, 12]),
    ("Ankle", [10, 13]),
]
ORACLE_ACTIVITIES = [
    "Standing/Walking", "Exercising", "Sitting", "Reaching/Crouching",
    "On The Floor", "Sports", "Miscellaneous",
]


def oracle_compute_3d_pck(error_data):
    """mpii_compute_3d_pck.m:19-50. error_data: list of (name, err(nj,1,nf)).
    Returns (pck_table, auc_table) as 2D lists incl. header row."""
    ng = len(ORACLE_GROUPS)
    thresh = list(range(0, 151, 5))
    pck_thresh = 150
    pck_curve = [[None] * (ng + 1) for _ in error_data]
    pck_arr = [[None] * (ng + 1) for _ in error_data]
    auc_arr = [[None] * (ng + 1) for _ in error_data]
    for i, (_, err) in enumerate(error_data):
        joint_count = 0
        nf = err.shape[2]
        for j in range(ng):
            joints = ORACLE_GROUPS[j][1]
            curve = []
            for t in thresh:
                cnt = 0.0
                for jj in joints:
                    for f in range(nf):
                        if err[jj, 0, f] < t:  # STRICT <
                            cnt += 1
                curve.append(cnt / (len(joints) * nf))
            pck_curve[i][j] = curve
            joint_count += len(joints)
            if pck_curve[i][ng] is None:
                pck_curve[i][ng] = [c * len(joints) for c in curve]
            else:
                pck_curve[i][ng] = [a + c * len(joints)
                                    for a, c in zip(pck_curve[i][ng], curve)]
            auc_arr[i][j] = 100.0 * sum(curve) / len(thresh)
            cnt = 0.0
            for jj in joints:
                for f in range(nf):
                    if err[jj, 0, f] < pck_thresh:
                        cnt += 1
            pck_arr[i][j] = 100.0 * cnt / (len(joints) * nf)
            if pck_arr[i][ng] is None:
                pck_arr[i][ng] = pck_arr[i][j] * len(joints)
            else:
                pck_arr[i][ng] += pck_arr[i][j] * len(joints)
        pck_arr[i][ng] /= joint_count
        pck_curve[i][ng] = [c / joint_count for c in pck_curve[i][ng]]
        auc_arr[i][ng] = 100.0 * sum(pck_curve[i][ng]) / len(thresh)

    header = [None] + [g for g, _ in ORACLE_GROUPS] + ["Total"]
    pck_table = [header] + [[error_data[i][0]] + pck_arr[i]
                            for i in range(len(error_data))]
    auc_table = [header] + [[error_data[i][0]] + auc_arr[i]
                            for i in range(len(error_data))]
    return pck_table, auc_table


def oracle_evaluate(seq_err, seq_act):
    """mpii_evaluate_errors.m. seq_err: list of (17,1,nf); seq_act: list of
    (nf,) 1-based labels. Returns (sequencewise, activitywise) 2D tables."""
    all_errors = np.concatenate(seq_err, axis=2)
    all_acts = np.concatenate([np.asarray(a).ravel() for a in seq_act])

    seq_mpjpe_rows = []
    error_dat = []
    for i, err in enumerate(seq_err):
        error_dat.append((f"TestSeq{i+1}", err))
        mpjpe = err.mean(axis=2)[:, 0]  # (17,)
        seq_mpjpe_rows.append([f"TestSeq{i+1}"] + list(mpjpe)
                              + [float(mpjpe.mean())])
    seq_pck, seq_auc = oracle_compute_3d_pck(error_dat)
    seq_pck[0][0] = "PCK"
    seq_auc[0][0] = "AUC"

    act_rows = []
    error_dat = []
    for ai in range(1, 8):
        sel = all_errors[:, :, all_acts == ai]
        error_dat.append((ORACLE_ACTIVITIES[ai - 1], sel))
        m = (sel.mean(axis=2)[:, 0] if sel.shape[2]
             else np.full(NJ, np.nan))
        act_rows.append([ORACLE_ACTIVITIES[ai - 1]] + list(m)
                        + [float(np.mean(m))])
    overall = all_errors.mean(axis=2)[:, 0]
    act_rows.append(["All"] + list(overall) + [float(overall.mean())])
    act_pck, act_auc = oracle_compute_3d_pck(error_dat)
    act_pck[0][0] = "PCK"
    act_auc[0][0] = "AUC"
    all_pck, all_auc = oracle_compute_3d_pck([("All", all_errors)])
    act_pck += all_pck[1:]
    act_auc += all_auc[1:]
    return (seq_mpjpe_rows, seq_pck, seq_auc), (act_rows, act_pck, act_auc)


# ----------------------------------------------------- fabricated payload

def make_payload(tmp_path):
    """Six sequences with varied lengths, holes in valid_frame, all seven
    activities, and per-joint error scales sweeping 0..300mm so every PCK
    curve is informative (incl. errors above the 150mm threshold)."""
    rng = np.random.RandomState(42)
    inference = {}
    seq_err, seq_act = [[] for _ in range(K)], []
    for i in range(1, N_SEQ + 1):
        F = 30 + 7 * i
        valid = (rng.rand(F) > 0.25).astype(np.float64)
        valid[:2] = [1, 0]
        annot3 = rng.randn(3, NJ, 1, F) * 500.0  # mm-scale absolute GT
        act = rng.randint(1, 8, size=F).astype(np.float64)
        act[2 + i] = i  # guarantee every activity appears somewhere
        sio.savemat(
            os.path.join(tmp_path, f"TS{i}", "annot_data.mat"),
            {"valid_frame": valid.reshape(-1, 1), "annot3": annot3,
             "activity_annotation": act.reshape(-1, 1),
             "annot2": np.zeros((2, NJ, 1, F))},
        )
        # predictions: root-centred GT + anisotropic noise, some >150mm
        pred = np.zeros((3, NJ, F, K), np.float64)
        scales = np.linspace(5.0, 180.0, NJ)
        for tt in range(K):
            noise = rng.randn(3, NJ, F) * scales[None, :, None] * (1 + tt)
            centred = annot3[:, :, 0, :] - annot3[:, 14:15, 0, :]
            pred[..., tt] = centred + noise
            # plant errors EXACTLY on thresholds (0, 5, 150 mm) on valid
            # frames — they distinguish the strict '<' from '<=' (an fp-
            # exact construction: error = sqrt(t^2) = t)
            vidx = np.flatnonzero(valid)
            for k, t_exact in enumerate((0.0, 5.0, 150.0, 150.0, 145.0)):
                f = int(vidx[k % len(vidx)])
                j = (k + i) % 14  # keep inside the PCK-scored joints
                pred[:, j, f, tt] = centred[:, j, f] + [t_exact, 0.0, 0.0]
        inference[f"TS{i}"] = pred

        vmask = valid.astype(bool)
        seq_act.append(act[vmask])
        for tt in range(K):
            centred = annot3[:, :, 0, :] - annot3[:, 14:15, 0, :]
            diff = pred[:, :, vmask, tt] - centred[:, :, vmask]
            e = np.sqrt((diff**2).sum(axis=0))  # (17, nv)
            seq_err[tt].append(e[:, None, :])
    return inference, seq_err, seq_act


def parse_csv(path):
    with open(path) as f:
        return [row for row in csv.reader(f)]


def cells_of(table_rows):
    """Flatten oracle rows to {(\"rowname\", colidx): value}."""
    out = {}
    for row in table_rows:
        name = row[0]
        for ci, v in enumerate(row[1:]):
            if isinstance(v, (int, float)) and v is not None:
                out[(name, ci)] = float(v)
    return out


def find_numeric_cells(csv_rows, row_name, start_row=0):
    for ri in range(start_row, len(csv_rows)):
        if csv_rows[ri] and csv_rows[ri][0] == row_name:
            vals = {}
            for ci, v in enumerate(csv_rows[ri][1:]):
                try:
                    vals[ci] = float(v)
                except ValueError:
                    pass
            return ri, vals
    raise AssertionError(f"row {row_name} not found from {start_row}")


def test_evaluate_3dhp_mat_matches_matlab_oracle(tmp_path):
    for i in range(1, N_SEQ + 1):
        os.makedirs(tmp_path / f"TS{i}")
    inference, seq_err, seq_act = make_payload(str(tmp_path))

    out_dir = tmp_path / "out"
    summaries = evaluate_3dhp_mat(inference, str(tmp_path), "J_Agg",
                                  str(out_dir), n_seq=N_SEQ)
    assert set(summaries) == {1, 2}

    for tt in range(K):
        (seq_mpjpe, seq_pck, seq_auc), (act_rows, act_pck, act_auc) = (
            oracle_evaluate(seq_err[tt], seq_act))

        # --- sequencewise CSV, every numeric cell ---
        rows = parse_csv(out_dir /
                         f"mpii_3dhp_evaluation_sequencewise_ori_J_Agg_t{tt+1}.csv")
        # MPJPE section (rows 2..7)
        for i in range(N_SEQ):
            _, got = find_numeric_cells(rows, f"TestSeq{i+1}")
            want = cells_of([seq_mpjpe[i]])
            for (name, ci), v in want.items():
                assert np.isclose(got[ci], v, rtol=1e-9), (tt, name, ci)
        # PCK section: after the "PCK" header row
        pck_row, _ = find_numeric_cells(rows, "PCK")
        for i in range(N_SEQ):
            _, got = find_numeric_cells(rows, f"TestSeq{i+1}", pck_row)
            for ci, v in enumerate(seq_pck[i + 1][1:]):
                assert np.isclose(got[ci], v, rtol=1e-9), (tt, "pck", i, ci)
        auc_row, _ = find_numeric_cells(rows, "AUC")
        for i in range(N_SEQ):
            _, got = find_numeric_cells(rows, f"TestSeq{i+1}", auc_row)
            for ci, v in enumerate(seq_auc[i + 1][1:]):
                assert np.isclose(got[ci], v, rtol=1e-9), (tt, "auc", i, ci)
        # golden summary cells (averaged over sequences)
        avg_mpjpe = np.mean([r[-1] for r in seq_mpjpe])
        avg_pck = np.mean([r[-1] for r in seq_pck[1:]])
        avg_auc = np.mean([r[-1] for r in seq_auc[1:]])
        assert np.isclose(float(rows[8][18]), avg_mpjpe, rtol=1e-9)
        assert rows[8][19] == "averaged MPJPE"
        assert np.isclose(float(rows[15][12]), avg_pck, rtol=1e-9)
        assert rows[15][13] == "averaged PCK"
        assert np.isclose(float(rows[22][9]), avg_auc, rtol=1e-9)
        assert rows[22][10] == "averaged AUC"
        # headline summary returned to callers
        assert np.isclose(summaries[tt + 1]["mpjpe"], avg_mpjpe, rtol=1e-9)
        assert np.isclose(summaries[tt + 1]["pck"], avg_pck, rtol=1e-9)
        assert np.isclose(summaries[tt + 1]["auc"], avg_auc, rtol=1e-9)

        # --- activitywise CSV, every numeric cell ---
        rows = parse_csv(out_dir /
                         f"mpii_3dhp_evaluation_activitywise_ori_J_Agg_t{tt+1}.csv")
        for ai, name in enumerate(ORACLE_ACTIVITIES + ["All"]):
            _, got = find_numeric_cells(rows, name)
            for ci, v in enumerate(act_rows[ai][1:]):
                if not np.isnan(v):
                    assert np.isclose(got[ci], v, rtol=1e-9), (tt, name, ci)
        pck_row, _ = find_numeric_cells(rows, "PCK")
        for ai, name in enumerate(ORACLE_ACTIVITIES):
            _, got = find_numeric_cells(rows, name, pck_row)
            for ci, v in enumerate(act_pck[ai + 1][1:]):
                assert np.isclose(got[ci], v, rtol=1e-9), (tt, name, "pck", ci)
        _, got = find_numeric_cells(rows, "All", pck_row)
        for ci, v in enumerate(act_pck[-1][1:]):
            assert np.isclose(got[ci], v, rtol=1e-9), (tt, "All", "pck", ci)
        auc_row, _ = find_numeric_cells(rows, "AUC")
        for ai, name in enumerate(ORACLE_ACTIVITIES):
            _, got = find_numeric_cells(rows, name, auc_row)
            for ci, v in enumerate(act_auc[ai + 1][1:]):
                assert np.isclose(got[ci], v, rtol=1e-9), (tt, name, "auc", ci)
        _, got = find_numeric_cells(rows, "All", auc_row)
        for ci, v in enumerate(act_auc[-1][1:]):
            assert np.isclose(got[ci], v, rtol=1e-9), (tt, "All", "auc", ci)


def test_oracle_detects_regressions(tmp_path):
    """The harness vs oracle comparison has teeth: a deliberately broken
    joint-group table (the pre-fix 'Head' group including joint 17) changes
    oracle cells, so equality with the port would fail."""
    rng = np.random.RandomState(0)
    err = [rng.rand(NJ, 1, 50) * 200 for _ in range(2)]
    base_pck, _ = oracle_compute_3d_pck([("a", err[0]), ("b", err[1])])
    global ORACLE_GROUPS
    orig = ORACLE_GROUPS
    try:
        ORACLE_GROUPS = [("Head", [0, 16])] + orig[1:]
        bad_pck, _ = oracle_compute_3d_pck([("a", err[0]), ("b", err[1])])
    finally:
        ORACLE_GROUPS = orig
    assert not np.isclose(bad_pck[1][1], base_pck[1][1])
