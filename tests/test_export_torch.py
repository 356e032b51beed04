"""Reverse conversion: flax AdaPoinTr → reference-format torch state dict.

Full round-trip against the ACTUAL reference module (CPU torch + stubs):
reference init → convert to flax → export back → strict load_state_dict
into a fresh reference model → identical eval outputs on both sides.
Skipped when /root/reference is absent (CI without the reference keeps the
forward-conversion guarantees via the frozen goldens)."""

import os

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)
def test_export_roundtrip_strict_load_and_outputs():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import torch

    from parity.run_parity import (
        build_reference_model,
        convert_and_merge,
        torch_state_numpy,
    )
    from imgadapointr_tpu.tools.convert_torch import (
        convert_adapointr,
        export_adapointr_torch,
    )
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    config = cfg_from_yaml_file("cfgs/PCN_models/AdaPoinTr-tiny.yaml")
    ref = build_reference_model(config.model, double=False)
    sd = torch_state_numpy(ref)

    res = convert_adapointr(sd, config.model)
    assert not res["missing"]
    exported = export_adapointr_torch(res["params"], res["batch_stats"], config.model)

    # strict load into a FRESH reference model — every key and shape must
    # line up with the real torch module tree
    ref2 = build_reference_model(config.model, double=False)
    ref2.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in exported.items()}, strict=True)

    # identical eval outputs: the exported weights ARE the original ones
    g = torch.Generator().manual_seed(11)
    x = torch.randn(2, 256, 3, generator=g)
    ref.eval(), ref2.eval()
    with torch.no_grad():
        a = ref(x)
        b = ref2(x)
    for t1, t2 in zip(a, b):
        np.testing.assert_allclose(t1.numpy(), t2.numpy(), atol=1e-6)

    # and they match OUR model's outputs through the forward converter
    import jax.numpy as jnp

    spec, variables = convert_and_merge(
        sd, config.model, [jnp.asarray(x.numpy())], double=False
    )
    coarse, fine = spec.module.apply(variables, jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(
        np.asarray(fine), a[1].numpy(), atol=2e-3,
        err_msg="flax vs reference outputs after round-trip",
    )


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)
def test_export_roundtrip_mismatched_encoder_decoder_dims():
    """enc_dim != dec_dim instantiates mem_link = Linear(enc, dec)
    (reference AdaPoinTr.py:74-77) — the converter must map it and the
    exporter must emit it (strict load fails on any missing key), and the
    converted flax model must reproduce the reference outputs (a silently
    random-init mem_link would wreck them)."""
    import copy

    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    import torch

    from parity.run_parity import (
        build_reference_model,
        convert_and_merge,
        torch_state_numpy,
    )
    from imgadapointr_tpu.tools.convert_torch import (
        convert_adapointr,
        export_adapointr_torch,
    )
    from imgadapointr_tpu.utils.config import cfg_from_yaml_file

    config = cfg_from_yaml_file("cfgs/PCN_models/AdaPoinTr-tiny.yaml")
    model_cfg = copy.deepcopy(config.model)
    model_cfg.decoder_config.embed_dim = 96  # encoder stays 192

    ref = build_reference_model(model_cfg, double=False)
    assert any(k.startswith("base_model.mem_link") for k in ref.state_dict())
    sd = torch_state_numpy(ref)

    res = convert_adapointr(sd, model_cfg)
    assert not res["missing"]
    exported = export_adapointr_torch(res["params"], res["batch_stats"], model_cfg)
    assert "base_model.mem_link.weight" in exported

    ref2 = build_reference_model(model_cfg, double=False)
    ref2.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in exported.items()},
        strict=True,
    )

    g = torch.Generator().manual_seed(13)
    x = torch.randn(2, 256, 3, generator=g)
    ref.eval()
    with torch.no_grad():
        a = ref(x)

    import jax.numpy as jnp

    spec, variables = convert_and_merge(
        sd, model_cfg, [jnp.asarray(x.numpy())], double=False
    )
    _, fine = spec.module.apply(variables, jnp.asarray(x.numpy()), train=False)
    np.testing.assert_allclose(
        np.asarray(fine), a[1].numpy(), atol=2e-3,
        err_msg="flax vs reference outputs with mem_link in play",
    )
