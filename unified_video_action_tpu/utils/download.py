"""Pretrained-artifact fetcher.

Equivalent of the reference's ``utils/download.py:6-61`` + ``fvd/download.py``:
fetch the frozen KL-16 VAE, the MAR pretrained initializations, and the I3D
FVD embedder into ``pretrained_models/``. URLs are the reference's public
release locations; in offline environments this module just reports what is
missing and where to put it (the import adapters in models/torch_import.py
consume the torch files directly).
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Optional

ARTIFACTS: Dict[str, Dict[str, str]] = {
    "kl16_vae": {
        "path": "pretrained_models/vae/kl16.ckpt",
        "url": "https://www.dropbox.com/scl/fi/hhmuvaiacrarfg28qxhwz/kl16.ckpt?rlkey=l44xipsezc8atcffdp4q7mwmh&dl=1",
        "note": "MAR's frozen KL-16 image VAE (torch state dict under 'model')",
    },
    "mar_base": {
        "path": "pretrained_models/mar/mar_base/checkpoint-last.pth",
        "url": "https://www.dropbox.com/scl/fi/f6dpuyjb7fudzxcyhvrhk/checkpoint-last.pth?rlkey=a6i4bo71vhfo4anp33n9ukujb&dl=1",
        "note": "MAR-Base ImageNet pretrain (torch, 'model_ema' key)",
    },
    "mar_large": {
        "path": "pretrained_models/mar/mar_large/checkpoint-last.pth",
        "url": "https://www.dropbox.com/scl/fi/pxacc5b2mrt3ifw4cah6k/checkpoint-last.pth?rlkey=m48ovo6g7ivcbosrbdaz0ehqt&dl=1",
        "note": "MAR-Large ImageNet pretrain",
    },
    "i3d_400": {
        "path": "pretrained_models/i3d_pretrained_400.pt",
        "url": "gdown:1fBNl3TS0LA5FEhZv5nMGJs2_7qQmvTmh",
        "note": "Kinetics-400 I3D for FVD",
    },
    # Task checkpoints from the reference release (README.md:30-34,100-103);
    # gdown ids extracted from the google-drive share links.
    "pusht_ckpt": {
        "path": "checkpoints/pusht.ckpt",
        "url": "gdown:1OduHcxfc2hqUYSccMQNf9g-vAt-q2UhF",
        "note": "UVA PushT task checkpoint (dill torch payload)",
    },
    "pusht_multitask_ckpt": {
        "path": "checkpoints/pusht_multitask.ckpt",
        "url": "gdown:1ZppZJyQdEdjhu8TIt4ddyaWy_mSdjoAZ",
        "note": "UVA PushT-M multitask checkpoint",
    },
    "libero10_ckpt": {
        "path": "checkpoints/libero10.ckpt",
        "url": "gdown:11c2VrmaRp48yw__5A5xpcu8EPzkexHSi",
        "note": "UVA Libero10 checkpoint",
    },
    "umi_multitask_ckpt": {
        "path": "checkpoints/umi_multitask.ckpt",
        "url": "gdown:1rUWtpXReULf8h42P80Go7GeTiZs3irFS",
        "note": "UVA UMI multitask checkpoint",
    },
}


def fetch(name: str, root: str = ".") -> Optional[str]:
    """Download one artifact if absent. Returns the local path, or None when
    the environment has no way to fetch it."""
    spec = ARTIFACTS[name]
    path = os.path.join(root, spec["path"])
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    url = spec["url"]
    # download to a .part name and publish by rename: a connection drop must
    # never leave a truncated file at the final path (which later runs would
    # treat as a completed download)
    tmp = path + ".part"
    try:
        if url.startswith("gdown:"):
            import gdown  # optional

            gdown.download(id=url.split(":", 1)[1], output=tmp, quiet=False)
        else:
            import urllib.request

            urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, path)
        return path
    except Exception as e:
        if os.path.exists(tmp):
            os.remove(tmp)
        print(
            f"[download] could not fetch {name} ({e}); place the file manually "
            f"at {path} — {spec['note']}",
            file=sys.stderr,
        )
        return None


def fetch_all(root: str = ".") -> Dict[str, Optional[str]]:
    return {name: fetch(name, root) for name in ARTIFACTS}


if __name__ == "__main__":
    for name, path in fetch_all().items():
        print(name, "->", path or "MISSING")
