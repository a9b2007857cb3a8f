"""End-to-end Ray Data pipeline builders + checkpoint/resume runner."""
