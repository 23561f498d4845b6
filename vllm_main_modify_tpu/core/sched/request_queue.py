"""Waiting-queue policies: FCFS and priority.

Reference: vllm/v1/core/sched/request_queue.py.
"""

from __future__ import annotations

import heapq
from abc import ABC, abstractmethod
from collections import deque
from collections.abc import Iterator

from vllm_main_modify_tpu.core.request import Request


class RequestQueue(ABC):

    @abstractmethod
    def add_request(self, request: Request) -> None:
        ...

    @abstractmethod
    def pop_request(self) -> Request:
        ...

    @abstractmethod
    def peek_request(self) -> Request:
        ...

    @abstractmethod
    def prepend_request(self, request: Request) -> None:
        """Put a request back at the front (failed to schedule)."""

    @abstractmethod
    def remove_requests(self, requests: set[Request]) -> None:
        ...

    @abstractmethod
    def __len__(self) -> int:
        ...

    @abstractmethod
    def __iter__(self) -> Iterator[Request]:
        ...

    def __bool__(self) -> bool:
        return len(self) > 0


class FCFSRequestQueue(RequestQueue):

    def __init__(self) -> None:
        self._q: deque[Request] = deque()

    def add_request(self, request: Request) -> None:
        self._q.append(request)

    def pop_request(self) -> Request:
        return self._q.popleft()

    def peek_request(self) -> Request:
        return self._q[0]

    def prepend_request(self, request: Request) -> None:
        self._q.appendleft(request)

    def remove_requests(self, requests: set[Request]) -> None:
        self._q = deque(r for r in self._q if r not in requests)

    def __len__(self) -> int:
        return len(self._q)

    def __iter__(self) -> Iterator[Request]:
        return iter(self._q)


class PriorityRequestQueue(RequestQueue):
    """Min-heap on (priority, arrival_time). Lower priority value first."""

    def __init__(self) -> None:
        self._heap: list[tuple[int, float, int, Request]] = []
        self._tie = 0

    def _key(self, r: Request) -> tuple[int, float, int, Request]:
        self._tie += 1
        return (r.priority, r.arrival_time, self._tie, r)

    def add_request(self, request: Request) -> None:
        heapq.heappush(self._heap, self._key(request))

    def pop_request(self) -> Request:
        return heapq.heappop(self._heap)[3]

    def peek_request(self) -> Request:
        return self._heap[0][3]

    def prepend_request(self, request: Request) -> None:
        heapq.heappush(self._heap, self._key(request))

    def remove_requests(self, requests: set[Request]) -> None:
        self._heap = [e for e in self._heap if e[3] not in requests]
        heapq.heapify(self._heap)

    def __len__(self) -> int:
        return len(self._heap)

    def __iter__(self) -> Iterator[Request]:
        return (e[3] for e in sorted(self._heap))


def create_request_queue(policy: str) -> RequestQueue:
    if policy == "priority":
        return PriorityRequestQueue()
    return FCFSRequestQueue()
