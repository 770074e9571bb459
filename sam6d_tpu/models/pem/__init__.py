"""Pose Estimation Model (PEM): two-stage background-token point matching."""

from sam6d_tpu.models.pem.model import PEM  # noqa: F401
