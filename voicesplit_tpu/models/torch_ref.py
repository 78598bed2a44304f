"""The reference topology built in torch, from its spec.

Used by the full-model parity tests (`tests/test_torch_parity.py`) and
the A100-class throughput anchor (`scripts/a100_anchor.py`).  This is a
re-implementation from the reference's layer spec
(`models/voicefilter/model.py:11-90`), NOT a copy of its code: 8
ZeroPad2d+Conv2d+BatchNorm2d+act layers (dilations 1,1,1,2,4,8,16 on
time), BiLSTM(8F+emb -> 2x400), fc1(600)+ReLU, fc2(601)+sigmoid.
`activation` 'relu' ⇒ VoiceFilter, 'mish' ⇒ VoiceSplit (the two reference
files differ only in that module, `models/voicesplit/model.py:19-52`).
"""

from __future__ import annotations


def build_reference_torch_model(
    activation: str = "relu",
    num_freq: int = 601,
    emb_dim: int = 256,
    lstm_dim: int = 400,
    fc1_dim: int = 600,
    fc2_dim: int = 601,
):
    import torch
    import torch.nn as nn

    act = {"relu": nn.ReLU, "mish": nn.Mish}[activation]
    # (pad (left, right, top, bottom) in (freq, time) order, in, out,
    #  kernel (kt, kf), dilation (dt, df)) — reference `:17-54`
    layer_specs = [
        ((3, 3, 0, 0), 1, 64, (1, 7), (1, 1)),
        ((0, 0, 3, 3), 64, 64, (7, 1), (1, 1)),
        ((2, 2, 2, 2), 64, 64, (5, 5), (1, 1)),
        ((2, 2, 4, 4), 64, 64, (5, 5), (2, 1)),
        ((2, 2, 8, 8), 64, 64, (5, 5), (4, 1)),
        ((2, 2, 16, 16), 64, 64, (5, 5), (8, 1)),
        ((2, 2, 32, 32), 64, 64, (5, 5), (16, 1)),
        (None, 64, 8, (1, 1), (1, 1)),
    ]
    convs = []
    for pad, cin, cout, k, d in layer_specs:
        if pad is not None:
            convs.append(nn.ZeroPad2d(pad))
        convs.extend([nn.Conv2d(cin, cout, kernel_size=k, dilation=d),
                      nn.BatchNorm2d(cout), act()])

    class RefModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Sequential(*convs)
            self.lstm = nn.LSTM(
                8 * num_freq + emb_dim, lstm_dim, batch_first=True, bidirectional=True
            )
            self.fc1 = nn.Linear(2 * lstm_dim, fc1_dim)
            self.fc2 = nn.Linear(fc1_dim, fc2_dim)

        def forward(self, x, emb):
            x = self.conv(x.unsqueeze(1))  # [B, 8, T, F]
            x = x.transpose(1, 2).contiguous().view(x.size(0), x.size(2), -1)
            emb = emb.unsqueeze(1).repeat(1, x.size(1), 1)
            x = torch.cat((x, emb), dim=2)
            x, _ = self.lstm(x)
            x = torch.relu(x)
            x = torch.relu(self.fc1(x))
            return torch.sigmoid(self.fc2(x))

    return RefModel()
