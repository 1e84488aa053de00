"""Independent numerical oracles for cross-validating the framework.

Modules here deliberately share ZERO code with ``noise_flow_tpu.models`` /
``noise_flow_tpu.ops``: they re-derive the reference's equations directly in
numpy so golden constants recorded from the JAX implementation are checked
against a second, independent evaluation path.
"""
