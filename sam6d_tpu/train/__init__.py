"""Training: correspondence loss, optimizer schedule, train step, solver."""
