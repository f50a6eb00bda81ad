"""Package platform-honoring logic (fspann_tpu/__init__).

This image's boot exports JAX_PLATFORMS=<tpu-plugin> and pins the config
before user code runs, so the env var is NOT necessarily the caller's
choice.  The package honors the env var only when every platform it names
is already in the config list — a programmatic config update that REMOVED
the pinned platform is an explicit narrowing and must win (round-3 bug:
a config-cpu calibration script silently ran on the TPU the moment it
imported the package).

Subprocess-based: each case needs a fresh interpreter with a controlled
(env, config) state at package-import time.  Only config STRINGS are
asserted — no backend is initialized, so the cases run on any platform.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(body: str, env_platforms: str | None):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if env_platforms is not None:
        env["JAX_PLATFORMS"] = env_platforms
    code = ("import sys; sys.path.insert(0, %r)\nimport jax\n" % REPO) + body
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    return out.stdout.strip().splitlines()[-1]


def test_programmatic_narrowing_wins_over_boot_env():
    # boot pinned config=axon + env=axon; user programmatically narrows to
    # cpu; the package import must NOT flip it back
    got = _run(
        "jax.config.update('jax_platforms', 'axon')\n"   # boot pin
        "jax.config.update('jax_platforms', 'cpu')\n"    # user's choice
        "import fspann_tpu\n"
        "print(jax.config.jax_platforms)\n", env_platforms="axon")
    assert got == "cpu"


def test_env_choice_honored_when_config_widened():
    # user exported JAX_PLATFORMS=cpu; boot widened the config to
    # 'axon,cpu' — the package must narrow the config to the env choice
    got = _run(
        "jax.config.update('jax_platforms', 'axon,cpu')\n"
        "import fspann_tpu\n"
        "print(jax.config.jax_platforms)\n", env_platforms="cpu")
    assert got == "cpu"


def test_default_boot_state_widened_with_trailing_cpu():
    # boot state (config=axon, env=axon): the package appends a trailing
    # ',cpu' so the host backend is always resolvable (device-free bank
    # build, ops/coding._cpu_device).  The default backend is unchanged —
    # first platform in the list wins — so device compute stays on axon.
    got = _run(
        "jax.config.update('jax_platforms', 'axon')\n"
        "import fspann_tpu\n"
        "print(jax.config.jax_platforms)\n", env_platforms="axon")
    assert got == "axon,cpu"


def test_widening_is_noop_when_cpu_already_present():
    got = _run(
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import fspann_tpu\n"
        "print(jax.config.jax_platforms)\n", env_platforms="cpu")
    assert got == "cpu"


def test_env_naming_unpinned_platform_ignored():
    # env names a platform the config does not contain (and config is
    # set): not honorable — the config stands
    got = _run(
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import fspann_tpu\n"
        "print(jax.config.jax_platforms)\n", env_platforms="tpu")
    assert got == "cpu"


def test_env_honored_when_config_unset():
    got = _run(
        "import fspann_tpu\n"
        "print(jax.config.jax_platforms or '(unset)')\n",
        env_platforms=None)
    # no env, no assertion on value — just that import works; with env and
    # unset config the env is honored
    got2 = _run(
        "import fspann_tpu\n"
        "print(jax.config.jax_platforms)\n", env_platforms="cpu")
    assert got2 == "cpu"
