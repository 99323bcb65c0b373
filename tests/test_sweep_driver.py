"""Sweep driver grid logic (run invocations monkeypatched out)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from experiments import sweep, average_results  # noqa: E402



pytestmark = pytest.mark.smoke

def test_quant_grid_cells(monkeypatch, tmp_path):
    calls, averaged = [], []
    monkeypatch.setattr(sweep, "run_main", lambda argv: calls.append(argv))
    monkeypatch.setattr(sweep.average_results, "main",
                        lambda argv: averaged.append(argv))
    sweep.main(["quant", "--methods", "bbb", "--tiers", "cifar",
                "--load", "floatdir-{seed}", "--seeds", "1",
                "--out", str(tmp_path)])
    # w in {8..3} at a=7, then a in {6..3} at w=8 — 10 cells x 1 seed
    assert len(calls) == 10
    pairs = []
    for argv in calls:
        a = argv[argv.index("--activation_precision") + 1]
        w = argv[argv.index("--weight_precision") + 1]
        pairs.append((int(a), int(w)))
        assert argv[argv.index("--load") + 1] == "floatdir-1"
    assert pairs == [(7, 8), (7, 7), (7, 6), (7, 5), (7, 4), (7, 3),
                     (6, 8), (5, 8), (4, 8), (3, 8)]
    assert len(averaged) == 10  # one aggregation per cell


def test_quant_grid_seeds_cells_and_default_load(monkeypatch, tmp_path):
    calls, averaged = [], []
    monkeypatch.setattr(sweep, "run_main", lambda argv: calls.append(argv))
    monkeypatch.setattr(sweep.average_results, "main",
                        lambda argv: averaged.append(argv))
    sweep.main(["quant", "--methods", "bbb", "--tiers", "mnist",
                "--seeds", "1", "2", "--cells", "a_7_w_8", "a_7_w_4",
                "--out", str(tmp_path)])
    assert len(calls) == 4  # 2 cells x 2 seeds
    # default load = the float grid's own per-seed layout
    loads = [argv[argv.index("--load") + 1] for argv in calls]
    assert loads[0].endswith("bbb-mnist-seed1")
    assert loads[1].endswith("bbb-mnist-seed2")
    seeds = [argv[argv.index("--seed") + 1] for argv in calls]
    assert seeds == ["1", "2", "1", "2"]
    assert len(averaged) == 2


def test_float_grid_seeds_and_average(monkeypatch, tmp_path):
    calls = []
    monkeypatch.setattr(sweep, "run_main", lambda argv: calls.append(argv))
    averaged = []
    monkeypatch.setattr(sweep.average_results, "main",
                        lambda argv: averaged.append(argv))
    sweep.main(["float", "--methods", "pointwise", "--tiers", "mnist",
                "--seeds", "1", "2", "3", "--out", str(tmp_path)])
    assert len(calls) == 3
    seeds = [argv[argv.index("--seed") + 1] for argv in calls]
    assert seeds == ["1", "2", "3"]
    assert len(averaged) == 1 and "--save" in averaged[0]


def test_reaggregate_rebuilds_from_done_seeds(tmp_path, monkeypatch):
    """tools/reaggregate.py: -avg rebuilt ONLY from seed dirs with a DONE
    marker, grouped per cell prefix (cutoff-interrupted cells get a
    consistent partial aggregate instead of a stale 3-seed one)."""
    import json
    from tools import reaggregate

    def cell(name, err, done=True):
        d = tmp_path / name
        d.mkdir()
        json.dump({"error": {"test": err}}, open(d / "results.json", "w"))
        if done:
            (d / "DONE").touch()

    cell("bbb-mnist-seed1", 0.1)
    cell("bbb-mnist-seed2", 0.3)
    cell("bbb-mnist-seed3", 0.9, done=False)   # interrupted — excluded
    cell("sgld-mnist-a_7_w_8-seed1", 0.5)
    reaggregate.main([str(tmp_path)])

    avg = json.load(open(tmp_path / "bbb-mnist-avg" / "results.json"))
    assert abs(avg["error"]["test"][0] - 0.2) < 1e-12
    avg2 = json.load(open(
        tmp_path / "sgld-mnist-a_7_w_8-avg" / "results.json"))
    assert abs(avg2["error"]["test"][0] - 0.5) < 1e-12
    # the avg dir itself must not be picked up as a seed group
    assert not (tmp_path / "bbb-mnist-avg-avg").exists()


def test_reaggregate_flags_orphan_avg(tmp_path, capsys):
    """An -avg dir with NO completed seed dirs is a stale copy (e.g. a
    committed aggregate seeded into a fresh tree without its seeds):
    reaggregate warns by default and deletes it under --prune-orphans
    (ADVICE r3: orphaned aggregates poison figures silently)."""
    import json
    from tools import reaggregate

    d = tmp_path / "sgld-mnist-avg"
    d.mkdir()
    json.dump({"error": {"test": [0.5]}}, open(d / "results.json", "w"))

    reaggregate.main([str(tmp_path)])
    assert "WARNING" in capsys.readouterr().out
    assert d.exists()

    reaggregate.main([str(tmp_path), "--prune-orphans"])
    assert "PRUNED" in capsys.readouterr().out
    assert not d.exists()


def test_package_campaign_done_only(tmp_path):
    """tools/package_campaign.py --done-only: per-seed run dirs without a
    DONE marker are skipped (safe to package while a queue is mid-cell);
    -avg dirs and the figures tree are copied regardless."""
    from tools import package_campaign

    runs, out = tmp_path / "runs", tmp_path / "out"
    for name, done in (("bbb-mnist-seed1", True),
                       ("bbb-mnist-seed2", False),
                       ("bbb-mnist-avg", False)):
        d = runs / name
        d.mkdir(parents=True)
        (d / "results.json").write_text("{}")
        if done:
            (d / "DONE").touch()
    (runs / "figures").mkdir()
    (runs / "figures" / "fig.png").write_text("png")

    package_campaign.main(["--runs", str(runs), "--out", str(out),
                           "--done-only"])
    assert (out / "bbb-mnist-seed1" / "results.json").exists()
    assert not (out / "bbb-mnist-seed2").exists()
    assert (out / "bbb-mnist-avg" / "results.json").exists()
    assert (out / "figures" / "fig.png").exists()

    # without the flag the in-flight dir is copied too
    package_campaign.main(["--runs", str(runs), "--out", str(out)])
    assert (out / "bbb-mnist-seed2" / "results.json").exists()


def test_package_campaign_keep_ckpts(tmp_path):
    """--keep-ckpts retains weights*.msgpack for matching run dirs only
    (float checkpoints a later session needs to extend the quant grid;
    everything else stays pruned)."""
    from tools import package_campaign

    runs, out = tmp_path / "runs", tmp_path / "out"
    for name in ("pointwise-cifar-seed1", "sgld-cifar-seed1",
                 "bbb-mnist-seed1"):
        d = runs / name
        d.mkdir(parents=True)
        (d / "results.json").write_text("{}")
        (d / "DONE").touch()
        (d / "weights.msgpack").write_bytes(b"w")
    # sgld float runs store epoch-stamped snapshots
    (runs / "sgld-cifar-seed1" / "weights_250.msgpack").write_bytes(b"s")

    package_campaign.main(["--runs", str(runs), "--out", str(out),
                           "--keep-ckpts", "pointwise-cifar-seed",
                           "sgld-cifar-seed"])
    assert (out / "pointwise-cifar-seed1" / "weights.msgpack").exists()
    assert (out / "sgld-cifar-seed1" / "weights_250.msgpack").exists()
    assert not (out / "bbb-mnist-seed1" / "weights.msgpack").exists()


def test_package_campaign_gzip_logs(tmp_path):
    """--gzip-logs N compresses big log/scalar streams in the packaged
    copy (and removes a stale uncompressed copy from an earlier package
    pass); tools/scalars_to_tb.py reads the .gz transparently."""
    import json

    from tools import package_campaign
    from tools import scalars_to_tb

    runs, out = tmp_path / "runs", tmp_path / "out"
    d = runs / "bbb-regression-seed1"
    d.mkdir(parents=True)
    (d / "DONE").touch()
    (d / "results.json").write_text("{}")
    recs = [{"tag": "train/nll", "value": float(i), "step": i,
             "wall_time": 1e9 + i} for i in range(200)]
    (d / "scalars.jsonl").write_text(
        "\n".join(json.dumps(r) for r in recs) + "\n")
    (d / "log.log").write_text("x" * 2048)

    # first package WITHOUT gzip leaves plain copies...
    package_campaign.main(["--runs", str(runs), "--out", str(out)])
    assert (out / "bbb-regression-seed1" / "scalars.jsonl").exists()
    # ...the gzip re-package replaces them
    package_campaign.main(["--runs", str(runs), "--out", str(out),
                           "--gzip-logs", "0.001"])
    pkg = out / "bbb-regression-seed1"
    assert (pkg / "scalars.jsonl.gz").exists()
    assert not (pkg / "scalars.jsonl").exists()
    assert (pkg / "log.log.gz").exists()

    tb_dir, n = scalars_to_tb.convert(str(pkg / "scalars.jsonl.gz"),
                                      str(tmp_path / "tb"))
    assert n == 200


def test_transient_failure_retries_once(monkeypatch, tmp_path):
    """A relay/device transient (round-5: remote_compile body closed)
    clears the half-written dir and retries; the retry succeeds."""
    calls = []

    def flaky(argv):
        calls.append(list(argv))
        if len(calls) == 1:
            raise RuntimeError(
                "INTERNAL: http://127.0.0.1:8103/remote_compile: read "
                "body: response body closed before all bytes were read")

    monkeypatch.setattr(sweep, "run_main", flaky)
    monkeypatch.setattr(sweep.time, "sleep", lambda s: None)
    monkeypatch.setattr(sweep.average_results, "main", lambda argv: None)
    sweep.main(["float", "--methods", "bbb", "--tiers", "mnist",
                "--seeds", "1", "--out", str(tmp_path)])
    assert len(calls) == 2


def test_non_transient_failure_raises_immediately(monkeypatch, tmp_path):
    calls = []

    def broken(argv):
        calls.append(argv)
        raise ValueError("bad config")

    monkeypatch.setattr(sweep, "run_main", broken)
    monkeypatch.setattr(sweep.average_results, "main", lambda argv: None)
    with pytest.raises(ValueError):
        sweep.main(["float", "--methods", "bbb", "--tiers", "mnist",
                    "--seeds", "1", "--out", str(tmp_path)])
    assert len(calls) == 1


def test_transient_failure_reraises_on_final_attempt(monkeypatch,
                                                     tmp_path):
    monkeypatch.setattr(sweep, "run_main", lambda argv: (_ for _ in ()
                        ).throw(RuntimeError("UNAVAILABLE: worker")))
    monkeypatch.setattr(sweep.time, "sleep", lambda s: None)
    monkeypatch.setattr(sweep.average_results, "main", lambda argv: None)
    with pytest.raises(RuntimeError):
        sweep.main(["float", "--methods", "bbb", "--tiers", "mnist",
                    "--seeds", "1", "--out", str(tmp_path)])
