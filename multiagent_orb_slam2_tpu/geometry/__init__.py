"""Batched SE3 / Sim3 / camera geometry on JAX arrays.

Replaces the reference's L0 substrate (cv::Mat poses + g2o::SE3Quat/Sim3,
Thirdparty/g2o/g2o/types/{se3quat.h,sim3.h}) with purely functional, batched
quaternion-based transforms. Everything broadcasts over leading axes so RANSAC
hypotheses / keyframes / agents are batch dimensions.
"""
from . import se3, sim3, camera  # noqa: F401
