"""Config loader tests — including loading the reference's own config.json."""

import json

import pytest

from voicesplit_tpu.config import (
    Config,
    load_config,
    load_config_from_str,
    _strip_json_comments,
)

REFERENCE_CONFIG = "/root/reference/config.json"


def test_defaults_match_reference_schema():
    c = Config()
    assert c.model.lstm_dim == 400
    assert c.model.fc1_dim == 600
    assert c.model.fc2_dim == 601
    assert c.model.emb_dim == 256
    assert c.audio.voicefilter.n_fft == 1200
    assert c.audio.voicefilter.num_freq == 601
    assert c.audio.voicefilter.hop_length == 160
    assert c.audio.voicefilter.win_length == 400
    assert c.loss.power == 0.30
    assert c.loss.complex_loss_ratio == 0.113


def test_strip_comments_preserves_strings():
    text = '{"a": "http://x//y", "b": 1 // comment\n}'
    parsed = json.loads(_strip_json_comments(text))
    assert parsed == {"a": "http://x//y", "b": 1}


def test_load_reference_config():
    """The reference config.json (commented JSON) loads unchanged."""
    c = load_config(REFERENCE_CONFIG)
    assert c.model_name == "voicesplit"
    assert c.loss.loss_name == "si_snr"
    assert c.train_config.batch_size == 2
    assert c.audio.backend == "voicefilter"
    assert c.audio.active.num_freq == 601
    assert c.audio.wavernn.n_fft == 2048
    assert c.audio.wavernn.hop_length == 200
    assert c.audio.wavernn.win_length == 800
    assert c.audio.waveglow.n_fft == 1024


def test_roundtrip_via_json_string():
    c = load_config(REFERENCE_CONFIG)
    c2 = load_config_from_str(c.to_json())
    assert c2 == c


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="unknown config keys"):
        load_config_from_str('{"nope": 1}')


def test_replace():
    c = Config()
    c2 = c.replace(model_name="voicefilter")
    assert c2.model_name == "voicefilter"
    assert c.model_name == "voicesplit"
