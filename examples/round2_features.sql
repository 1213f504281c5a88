-- backend: spark
-- Round-2 feature tour: JDBC source prep via exec_sql_in_source, nested
-- ETL runs, object-arg injection, set_config/set_parallelism, and the
-- LLM-ops step functions.  Runs end-to-end on embedded Derby
-- (tests/test_examples.py keeps it green).

-- target=variables
select 'jdbc:derby:memory:round2demo;create=true' as src_url

-- target=func.set_config(spark.sql.session.timeZone, UTC)

-- target=func.set_parallelism(8)

-- prepare a source RDB table: each non-comment line of this step body
-- executes in the source over the JVM's DriverManager (${__step__} passes
-- the live Step object)
-- target=func.exec_sql_in_source(${__step__}, demo_db, ${src_url})
create table seeds (doc_id int, text varchar(200))
insert into seeds values (1, 'the quick brown fox jumps over the lazy dog')
insert into seeds values (2, 'the quick brown fox jumps over the lazy cat')
insert into seeds values (3, 'the quick brown fox jumps over the lazy dog')

-- read it back through Spark's JDBC source
-- target=func.read_jdbc(jdbc:derby:memory:round2demo, seeds, seeds_view)

-- near-dup candidates over the JDBC-sourced docs (MinHash+LSH with the
-- band-bucket cap; 8 sigs, 2 bands, cap 16)
-- target=func.minhash_candidates(seeds_view, candidate_pairs, text, doc_id, 8, 2, 16)

-- target=check.found_the_exact_dup
select (select count(*) from candidate_pairs where doc_a = 1 and doc_b = 3)
           as actual,
       1 as expected

-- target=log.candidates
select * from candidate_pairs order by doc_a, doc_b
