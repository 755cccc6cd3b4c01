from orb_slam2_tpu.geometry import se3, sim3, camera  # noqa: F401
