"""Installer / doctor surface tests (install_pro_b_gan.py semantics,
SURVEY.md §2.3 C12-C16)."""

import pytest

from probgan_tpu.cli import install


def test_no_flag_prints_usage_and_exits_1(capsys):
    rc = install.main([])
    out = capsys.readouterr().out
    assert rc == 1
    assert "Please specify installation target:" in out
    assert "--colab" in out and "--local" in out and "--check" in out


def test_check_passes_in_this_env(capsys):
    rc = install.main(["--check"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "JAX - OK" in out
    assert "Version Information:" in out
    assert "Default backend:" in out
    assert "All checks passed! Prot-B-GAN is ready to use." in out
    assert "Try running: python prot_b_gan.py --help" in out


def test_check_reports_devices(capsys):
    install.main(["--check"])
    out = capsys.readouterr().out
    # 8 virtual CPU devices from the test mesh
    assert "Device count: 8" in out


def test_run_command_success_and_failure(capsys):
    assert install.run_command("true", "probe true") is True
    assert install.run_command("false", "probe false") is False
    out = capsys.readouterr().out
    assert "Success" in out
    assert "Failed:" in out


def test_install_continues_past_failures(monkeypatch, capsys):
    """Aggregate-and-continue semantics (install_pro_b_gan.py:52-55): one
    failing step doesn't stop later steps; the aggregate is failure."""
    calls = []

    def fake_run(cmd, desc=""):
        calls.append(cmd)
        return "flax" not in cmd  # fail the middle step

    monkeypatch.setattr(install, "run_command", fake_run)
    ok = install.install_local()
    out = capsys.readouterr().out
    assert ok is False
    assert len(calls) == 3  # all steps attempted
    assert "Some installations failed" in out


def test_install_success_message(monkeypatch, capsys):
    monkeypatch.setattr(install, "run_command", lambda cmd, desc="": True)
    ok = install.install_colab()
    out = capsys.readouterr().out
    assert ok is True
    assert "Installation completed successfully!" in out
    assert "python prot_b_gan.py --data_root /path/to/data --debug --verbose" in out


@pytest.mark.parametrize("flag,fn", [("--colab", "install_colab"), ("--local", "install_local")])
def test_flag_dispatch_and_exit_codes(monkeypatch, flag, fn):
    monkeypatch.setattr(install, fn, lambda: True)
    assert install.main([flag]) == 0
    monkeypatch.setattr(install, fn, lambda: False)
    assert install.main([flag]) == 1
