"""One-step-ahead scheduling (reference:
vllm/v1/core/sched/async_scheduler.py ``AsyncScheduler``).

Step N+1 is scheduled before step N's sampled tokens reach the host;
each sampling request carries a *placeholder* for the in-flight token.
The runner chains the actual token value on-device (the device output
of step N feeds step N+1's input ids), so the host never blocks on the
device inside the scheduling loop — on tunneled TPU this hides the full
host↔device round trip; on local hardware it hides dispatch latency.
"""

from __future__ import annotations

from vllm_main_modify_tpu.core.request import Request
from vllm_main_modify_tpu.core.sched.output import SchedulerOutput
from vllm_main_modify_tpu.core.sched.scheduler import Scheduler


class AsyncScheduler(Scheduler):

    def _update_after_schedule(
            self, scheduler_output: SchedulerOutput) -> None:
        super()._update_after_schedule(scheduler_output)
        k = scheduler_output.num_decode_steps
        for req_id in scheduler_output.num_scheduled_tokens:
            request = self.requests[req_id]
            if k > 1:
                # multi-step decode chunk: K tokens will be sampled on
                # device before the host sees any of them
                request.num_output_placeholders += k
            elif (request.num_computed_tokens == request.num_tokens +
                    request.num_output_placeholders):
                # this step will sample a token whose value the host
                # has not seen yet
                request.num_output_placeholders += 1

    def _append_and_check_stop(self, request: Request,
                               new_token_ids: list[int]):
        new_token_ids, stopped = super()._append_and_check_stop(
            request, new_token_ids)
        request.num_output_placeholders -= len(new_token_ids)
        assert request.num_output_placeholders >= 0
        return new_token_ids, stopped


def create_scheduler(config, **kwargs) -> Scheduler:
    cls = (AsyncScheduler
           if config.scheduler_config.async_scheduling else Scheduler)
    return cls(config, **kwargs)
