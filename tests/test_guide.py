"""Run the user guide's code blocks (the analogue of the reference's
test_user_docs.rs, which compiles+runs every user-guide markdown snippet —
SURVEY.md §4.5).

Blocks execute in order in ONE shared namespace (later sections use earlier
names, as a reader would).  Production parameter names are substituted with
the tiny insecure TEST sets so the walkthrough finishes on the 2-vCPU test
host; the substitutions are name-for-name (the resolvers accept the TEST
names), so every API call is exercised exactly as written.  Blocks
containing literal `...` placeholders are illustrative and skipped.
"""
import re
from pathlib import Path

import numpy as np
import pytest

GUIDE = Path(__file__).resolve().parent.parent / "docs" / "GUIDE.md"

# production -> test-set substitutions (tiny lattices; values/APIs unchanged)
SUBS = [
    ('"PARAM_MESSAGE_2_CARRY_2_KS_PBS"', '"TEST_PARAMS_SHORTINT"'),
    ('"DEFAULT_PARAMETERS_KS_PBS"', '"TEST_PARAMS_BOOLEAN"'),
    ('gadget.gen_keys("DEFAULT_PARAMETERS"', 'gadget.gen_keys("TEST_PARAMS_GADGET"'),
    ("ConfigBuilder().build()",
     'ConfigBuilder().use_custom_parameters("TEST_PARAMS_SHORTINT").build()'),
    # §6 core_crypto walkthrough: shrink the lattice dims for CPU
    ("generate_lwe_secret_key(rng.fork(key, 0), 742)",
     "generate_lwe_secret_key(rng.fork(key, 0), 16)"),
    ("generate_glwe_secret_key(rng.fork(key, 1), 1, 2048)",
     "generate_glwe_secret_key(rng.fork(key, 1), 1, 256)"),
    ('"WOPBS_PARAM_MESSAGE_2_CARRY_2_KS_PBS"', '"TEST_PARAMS_WOPBS"'),
    ('shift_key="auto"', 'shift_key="TEST_PARAMS_WOPBS"'),
]


def _blocks():
    text = GUIDE.read_text()
    return re.findall(r"```python\n(.*?)```", text, flags=re.S)


def test_guide_snippets_run(tmp_path, monkeypatch, capsys):
    blocks = _blocks()
    assert len(blocks) >= 8, "guide lost its code blocks?"
    monkeypatch.chdir(tmp_path)  # §7 writes server_key.npz
    ns = {}
    ran = 0
    for i, block in enumerate(blocks):
        if "..." in re.sub(r"#.*", "", block):   # illustrative placeholder
            continue
        src = block
        for old, new in SUBS:
            src = src.replace(old, new)
        try:
            exec(compile(src, f"GUIDE.md[block {i}]", "exec"), ns)
        except Exception as e:
            pytest.fail(f"guide block {i} failed: {e}\n--- source ---\n{src}")
        ran += 1
    assert ran >= 7
    # spot-check a printed value from §1 (operator overloading result)
    out = capsys.readouterr().out
    assert "[88" in out or "88" in out
