"""gtsam_petercdev_tpu.core"""
