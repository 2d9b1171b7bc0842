"""End-to-end pipeline compositions (the reference's query lifecycle §3)."""
