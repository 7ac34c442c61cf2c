"""End-to-end query plans and the driver-facing query/oracle registry."""
