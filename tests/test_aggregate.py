"""Results aggregation + hyperparameter-sweep analysis (reference C20).

The reference's angle_statistics.ipynb summarizes APL angle sweeps from a
hand-maintained spreadsheet; here the sweep tables are derived from the
experiment driver's own artifacts (result_run*.json + config.json).
"""

import json

import pytest

from audio_few_shot_learning_tpu.cli.aggregate_results import collect, main, sweep


def _write_experiment(root, name, accs, angle=None):
    d = root / name
    d.mkdir(parents=True)
    for i, a in enumerate(accs):
        (d / f"result_run{i}.json").write_text(
            json.dumps({"mean_accuracy": a, "best_val_accuracy": a + 0.01})
        )
        (d / f"metrics_run{i}.jsonl").write_text(
            json.dumps({"epoch": 3, "episodes_per_sec": 10.0}) + "\n"
        )
    if angle is not None:
        cfg = {
            "experiment": {
                "loss": {"l_param": 1.0, "angular": {"use": True, "angle": angle}}
            },
            "model": {},
        }
        (d / "config.json").write_text(json.dumps(cfg))


@pytest.fixture
def sweep_root(tmp_path):
    root = tmp_path / "experiments"
    _write_experiment(root, "esc_a0_s1", [0.60, 0.62], angle=0.0)
    _write_experiment(root, "esc_a0_s2", [0.61], angle=0.0)
    _write_experiment(root, "esc_a15", [0.70, 0.72], angle=15.0)
    _write_experiment(root, "esc_a30", [0.65], angle=30.0)
    _write_experiment(root, "legacy_no_config", [0.50])
    return root


def test_collect_reads_runs_and_config(sweep_root):
    summary = collect(str(sweep_root))
    assert set(summary) == {
        "esc_a0_s1",
        "esc_a0_s2",
        "esc_a15",
        "esc_a30",
        "legacy_no_config",
    }
    s = summary["esc_a15"]
    assert s["runs"] == 2
    assert s["run_accuracies"] == [0.70, 0.72]
    assert s["config"]["experiment"]["loss"]["angular"]["angle"] == 15.0
    assert summary["legacy_no_config"]["config"] is None


def test_sweep_groups_by_angle_and_pools_runs(sweep_root):
    sw = sweep(collect(str(sweep_root)), "angle")
    assert sw["key"] == "loss.angular.angle"
    groups = sw["groups"]
    assert set(groups) == {"0.0", "15.0", "30.0"}
    # angle=0 pools runs from both seed experiments
    g0 = groups["0.0"]
    assert g0["runs"] == 3
    assert sorted(g0["experiments"]) == ["esc_a0_s1", "esc_a0_s2"]
    assert abs(g0["test_accuracy_mean"] - (0.60 + 0.62 + 0.61) / 3) < 1e-9
    assert groups["15.0"]["test_accuracy_mean"] == pytest.approx(0.71)
    # the config-less legacy dir is reported, not silently dropped
    assert sw["skipped"] == ["legacy_no_config"]


def test_sweep_dotted_key(sweep_root):
    sw = sweep(collect(str(sweep_root)), "loss.l_param")
    assert set(sw["groups"]) == {"1.0"}
    assert sw["groups"]["1.0"]["runs"] == 6


def test_cli_sweep_output(sweep_root, capsys):
    out = main([str(sweep_root), "--sweep", "angle"])
    printed = capsys.readouterr().out
    assert "loss.angular.angle" in printed
    assert "15.0" in printed and "esc_a15" in printed
    assert out["groups"]["30.0"]["test_accuracy_mean"] == pytest.approx(0.65)


def test_cli_plain_table_still_works(sweep_root, capsys):
    summary = main([str(sweep_root)])
    printed = capsys.readouterr().out
    assert "esc_a30" in printed
    assert summary["esc_a30"]["test_accuracy_mean"] == pytest.approx(0.65)


def test_run_sweep_orchestration(tmp_path, monkeypatch, capsys):
    """Sweep runner: per-value configs, folder naming, end table — with the
    training call stubbed to write driver-shaped artifacts."""
    import audio_few_shot_learning_tpu.cli.run_sweep as rs

    e_cfg = tmp_path / "exp.json"
    e_cfg.write_text(
        json.dumps(
            {
                "experiment_folder": "esc",
                "loss": {"angular": {"use": True, "angle": 0.0}},
            }
        )
    )
    m_cfg = tmp_path / "model.json"
    m_cfg.write_text("{}")
    root = tmp_path / "experiments"

    launched = []

    def fake_run_experiment(exp, mdl, experiments_root, num_runs=None):
        launched.append((exp.loss.angular.angle, exp.experiment_folder, num_runs))
        import dataclasses

        d = root / exp.experiment_folder
        d.mkdir(parents=True)
        (d / "result_run0.json").write_text(
            json.dumps(
                {
                    "mean_accuracy": 0.5 + exp.loss.angular.angle / 100,
                    "best_val_accuracy": 0.5,
                }
            )
        )
        (d / "config.json").write_text(
            json.dumps({"experiment": dataclasses.asdict(exp), "model": {}})
        )

    monkeypatch.setattr(
        "audio_few_shot_learning_tpu.train.experiment.run_experiment",
        fake_run_experiment,
    )
    sw = rs.main(
        [
            "-e", str(e_cfg), "-m", str(m_cfg),
            "--key", "angle", "--values", "0", "15",
            "--experiments-root", str(root), "--runs", "2",
        ]
    )
    assert [l[0] for l in launched] == [0.0, 15.0]
    assert launched[0][1] == "esc_angle=0" and launched[0][2] == 2
    assert set(sw["groups"]) == {"0.0", "15.0"}
    assert sw["groups"]["15.0"]["test_accuracy_mean"] == pytest.approx(0.65)
    assert "sweep over loss.angular.angle" in capsys.readouterr().out


def test_set_dotted_and_parse_value():
    from audio_few_shot_learning_tpu.cli.run_sweep import _parse_value, set_dotted

    d = {}
    set_dotted(d, "loss.angular.angle", 15)
    assert d == {"loss": {"angular": {"angle": 15}}}
    assert _parse_value("15") == 15
    assert _parse_value("0.5") == 0.5
    assert _parse_value("true") is True
    assert _parse_value("min_label") == "min_label"
