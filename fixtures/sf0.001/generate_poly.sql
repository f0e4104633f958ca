SELECT CAST(request AS VARCHAR) AS request, CAST(step AS BIGINT) AS step, CAST(stream AS BIGINT) AS stream, CAST(notes AS VARCHAR) AS notes, CAST(vol AS DOUBLE) AS vol, CAST(brightness AS DOUBLE) AS brightness, CAST(noise AS DOUBLE) AS noise, CAST(harmonicity AS DOUBLE) AS harmonicity, CAST(attack AS DOUBLE) AS attack, CAST(decay_sustain AS DOUBLE) AS decay_sustain, CAST(release AS DOUBLE) AS release, CAST(chord_range AS BIGINT) AS chord_range, CAST(density AS DOUBLE) AS density, CAST(sustain AS DOUBLE) AS sustain, CAST(legato AS DOUBLE) AS legato, CAST(generated AS BOOLEAN) AS generated FROM (VALUES
('warmup', 0, 0, '60', 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0, 1.0, 0.5, 0.0, FALSE),
('warmup', 1, 0, '76', 0.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0, 0.0, 0.5, 0.0, TRUE),
('duo', 0, 0, '60,64', 1.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 4, 0.4, 0.5, 0.0, FALSE),
('duo', 1, 0, '62,65', 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 3, 0.5, 0.5, 0.0, FALSE),
('duo', 2, 0, '54', 0.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 2, 0.0, 0.5, 0.0, TRUE),
('duo', 3, 0, '51', 0.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 1, 0.0, 0.5, 0.5, TRUE),
('duo', 3, 1, '70', 1.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 1, 0.0, 0.5, 0.5, TRUE),
('duo', 4, 0, '63', 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 1, 0.0, 0.5, 1.0, TRUE),
('duo', 4, 1, '75', 1.0, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 1, 0.0, 0.5, 1.0, TRUE)
) AS t(request, step, stream, notes, vol, brightness, noise, harmonicity, attack, decay_sustain, release, chord_range, density, sustain, legato, generated)