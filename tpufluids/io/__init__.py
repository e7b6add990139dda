"""I/O: legacy-VTK export (visit_writer parity), snapshots, checkpoints."""
