select user_id,
       count(*) as n_sessions,
       sum(n_events) as n_events,
       max(session_end) as last_seen
from {{ sessions }}
group by user_id
