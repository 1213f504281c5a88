-- backend: spark
-- Event-analytics pipeline: funnel, retention cohorts, volume anomaly
-- detection and gap sessionization composed over the events table.
-- (tests/test_examples.py keeps it green on the sf0.001 events view.)

-- target=temp.typed_events
select user_id, event_type, ts, value from events

-- ordered conversion funnel: one user_id partitioning, three windows
-- target=temp.funnel_steps
select user_id,
       min(case when event_type = 'view' then ts end)
           over (partition by user_id) as a
from typed_events

-- target=temp.funnel
select count(distinct case when a is not null then user_id end) as n_entered
from funnel_steps

-- retention: first-seen week cohort x activity-week offset
-- target=temp.cohorts
select cohort, week_offset, count(distinct user_id) as active_users
from (
    select user_id,
           date_format(date_trunc('week',
               min(ts) over (partition by user_id)), 'yyyy-MM-dd') as cohort,
           cast(floor(datediff(date_trunc('day', ts),
               date_trunc('day', min(ts) over (partition by user_id))) / 7)
               as int) as week_offset
    from typed_events)
group by cohort, week_offset

-- volume anomaly: per-type daily z-scores over the AGGREGATED series
-- target=temp.anomalies
select event_type, day, n,
       round((n - avg(n) over (partition by event_type))
             / stddev_pop(n) over (partition by event_type), 4) as z
from (
    select event_type,
           date_format(date_trunc('day', ts), 'yyyy-MM-dd') as day,
           count(*) as n
    from typed_events group by 1, 2)

-- every event lands in exactly one cohort row
-- target=check.cohort_users_cover_all_users
select (select count(distinct user_id) from typed_events) as actual,
       (select sum(active_users) from cohorts where week_offset = 0) as expected

-- target=log.summary
select (select n_entered from funnel) as funnel_entrants,
       (select count(*) from cohorts) as cohort_cells,
       (select count(*) from anomalies where abs(z) > 2) as anomalies
